"""Checkpoint / resume: exact state round-trip and resumed-run equivalence
(a capability the reference lacks; SURVEY.md §5)."""

import numpy as np
import pytest

from style_transfer_tpu.engine import StyleTransfer
from style_transfer_tpu.models.weights import random_params
from style_transfer_tpu.step import AdamState
from style_transfer_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from style_transfer_tpu.utils.ema import EMAState

PARAMS = random_params(0)


def test_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(1, 8, 8, 3).astype(np.float32)
    adam = AdamState(
        mu=rng.rand(1, 8, 8, 3).astype(np.float32),
        nu=rng.rand(1, 8, 8, 3).astype(np.float32),
        count=np.asarray(42, np.int32),
    )
    ema = EMAState(value=rng.rand(1, 8, 8, 3).astype(np.float32),
                   accum=np.asarray(0.9, np.float32))
    p = tmp_path / "ck.npz"
    save_checkpoint(p, image=img, adam=adam, ema=ema, scale_index=2,
                    done_iters=150, meta={"w": 8, "h": 8})
    ck = load_checkpoint(p)
    np.testing.assert_array_equal(ck["image"], img)
    np.testing.assert_array_equal(ck["adam_mu"], adam.mu)
    assert int(ck["adam_count"]) == 42
    assert ck["scale_index"] == 2 and ck["done_iters"] == 150
    assert ck["meta"]["w"] == 8


def test_resume_matches_uninterrupted(tmp_path, content_pil, style_pil):
    """Run 20 iters straight vs 10 iters -> checkpoint -> resume 10 more:
    identical final image (state round-trips exactly; targets recompute
    deterministically)."""
    kw = dict(min_scale=64, end_scale=64, iterations=20, initial_iterations=20)

    st_a = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=10)
    img_a = np.asarray(st_a.stylize(content_pil, [style_pil], **kw))

    ck = tmp_path / "ck.npz"
    st_b = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=10)

    class Stop(Exception):
        pass

    def interrupt(it):
        if it.i >= 10:
            raise Stop

    with pytest.raises(Stop):
        st_b.stylize(content_pil, [style_pil], checkpoint=str(ck),
                     callback=interrupt, **kw)
    assert ck.is_file()

    st_c = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=10)
    img_c = np.asarray(
        st_c.stylize(content_pil, [style_pil], checkpoint=str(ck), resume=True, **kw)
    )
    np.testing.assert_array_equal(img_a, img_c)


def test_resume_skips_completed_scales(tmp_path, content_pil, style_pil):
    ck = tmp_path / "ck.npz"
    st = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=10)
    st.stylize(content_pil, [style_pil], min_scale=64, end_scale=96,
               iterations=10, initial_iterations=10, checkpoint=str(ck))
    saved = load_checkpoint(ck)
    assert saved["scale_index"] == 1  # finished on the last scale

    its = []
    st2 = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=10)
    st2.stylize(content_pil, [style_pil], min_scale=64, end_scale=96,
                iterations=10, initial_iterations=10,
                checkpoint=str(ck), resume=True, callback=its.append)
    assert its == []  # everything already done
