"""Checkpoint / resume: exact state round-trip and resumed-run equivalence
(a capability the reference lacks; SURVEY.md §5)."""

import numpy as np
import pytest

from style_transfer_tpu.engine import StyleTransfer
from style_transfer_tpu.models.weights import random_params
from style_transfer_tpu.step import AdamState
from style_transfer_tpu.utils.checkpoint import (
    AsyncCheckpointWriter,
    load_checkpoint,
    save_checkpoint,
)
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


def _tiny_state(rng):
    adam = AdamState(
        mu=rng.rand(1, 4, 4, 3).astype(np.float32),
        nu=rng.rand(1, 4, 4, 3).astype(np.float32),
        count=np.asarray(1, np.int32),
    )
    ema = EMAState(value=rng.rand(1, 4, 4, 3).astype(np.float32),
                   accum=np.asarray(0.5, np.float32))
    return adam, ema


def test_async_writer_latest_wins(tmp_path):
    """Submits coalesce: after flush, the file holds the NEWEST state even
    when several were queued faster than they could be written."""
    rng = np.random.RandomState(1)
    adam, ema = _tiny_state(rng)
    p = tmp_path / "ck.npz"
    w = AsyncCheckpointWriter()
    try:
        for it in range(1, 8):
            w.submit(str(p), image=np.full((1, 4, 4, 3), it, np.float32),
                     adam=adam, ema=ema, scale_index=0, done_iters=it * 10)
        w.flush()
        ck = load_checkpoint(p)
        assert ck["done_iters"] % 10 == 0 and ck["done_iters"] <= 70
        # Last submitted value is what flush guarantees durable.
        w.submit(str(p), image=np.full((1, 4, 4, 3), 99, np.float32),
                 adam=adam, ema=ema, scale_index=1, done_iters=99)
        w.flush()
        ck = load_checkpoint(p)
        assert ck["done_iters"] == 99 and ck["scale_index"] == 1
        np.testing.assert_array_equal(ck["image"], 99.0)
    finally:
        w.close()


def test_async_writer_surfaces_errors(tmp_path):
    rng = np.random.RandomState(2)
    adam, ema = _tiny_state(rng)
    w = AsyncCheckpointWriter()
    w.submit(str(tmp_path / "nodir" / "\0bad"), image=np.zeros((1, 4, 4, 3)),
             adam=adam, ema=ema, scale_index=0, done_iters=1)
    with pytest.raises(Exception):
        w.close()


def test_checkpoint_cadence(tmp_path, content_pil, style_pil, monkeypatch):
    """checkpoint_every gates mid-scale writes; scale ends always write."""
    import style_transfer_tpu.utils.checkpoint as ckpt_mod

    calls = []
    real = ckpt_mod.save_checkpoint

    def counting(path, **kw):
        calls.append(kw["done_iters"])
        real(path, **kw)

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", counting)
    ck = tmp_path / "ck.npz"
    st = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=5)
    st.stylize(content_pil, [style_pil], min_scale=64, end_scale=64,
               iterations=20, initial_iterations=20,
               checkpoint=str(ck), checkpoint_every=1000)
    # 4 chunks of 5; only the scale end (done_iters == 20) qualifies.
    assert calls == [20]


@pytest.mark.slow
def test_resume_matches_uninterrupted(tmp_path, content_pil, style_pil):
    """Run 20 iters straight vs 10 iters -> checkpoint -> resume 10 more:
    identical final image (state round-trips exactly; targets recompute
    deterministically)."""
    kw = dict(min_scale=64, end_scale=64, iterations=20, initial_iterations=20,
              checkpoint_every=10)

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


def test_rng_state_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = np.zeros((1, 4, 4, 3), np.float32)
    adam = AdamState(mu=img, nu=img, count=np.asarray(1, np.int32))
    ema = EMAState(value=img, accum=np.asarray(0.5, np.float32))
    rng.rand(100)  # advance
    expected_next = np.random.RandomState(0)
    expected_next.rand(100)

    p = tmp_path / "ck.npz"
    save_checkpoint(p, image=img, adam=adam, ema=ema, scale_index=0,
                    done_iters=1, rng=rng)
    ck = load_checkpoint(p)

    from style_transfer_tpu.utils.checkpoint import unpack_rng_state

    fresh = np.random.RandomState(99)
    unpack_rng_state(fresh, ck["rng"], ck["rng_keys"])
    np.testing.assert_array_equal(fresh.rand(5), expected_next.rand(5))


def test_resume_refuses_optimizer_mismatch(tmp_path, content_pil, style_pil):
    ck = tmp_path / "ck.npz"
    st = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=5)
    st.stylize(content_pil, [style_pil], min_scale=64, end_scale=64,
               iterations=5, initial_iterations=5, checkpoint=str(ck))
    st2 = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=5)
    with pytest.raises(ValueError, match="optimizer"):
        st2.stylize(content_pil, [style_pil], min_scale=64, end_scale=64,
                    iterations=5, initial_iterations=5,
                    optimizer="lbfgs", checkpoint=str(ck), resume=True)


@pytest.mark.slow
def test_resume_refuses_changed_geometry(tmp_path, content_pil, style_pil):
    ck = tmp_path / "ck.npz"
    st = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=5)
    st.stylize(content_pil, [style_pil], min_scale=64, end_scale=64,
               iterations=5, initial_iterations=5, checkpoint=str(ck))
    st2 = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=5)
    with pytest.raises(ValueError, match="does not match|out of range"):
        st2.stylize(content_pil, [style_pil], min_scale=96, end_scale=96,
                    iterations=5, initial_iterations=5,
                    checkpoint=str(ck), resume=True)


@pytest.mark.slow
def test_lbfgs_zoom_checkpoint_warns_and_skips(tmp_path, content_pil,
                                               style_pil, capsys):
    """Only the optax lbfgs-zoom variant skips checkpointing (its state is
    not serialized); reference-flavor lbfgs is first-class."""
    ck = tmp_path / "ck.npz"
    st = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=5)
    st.stylize(content_pil, [style_pil], min_scale=64, end_scale=64,
               iterations=5, initial_iterations=5,
               optimizer="lbfgs-zoom", checkpoint=str(ck))
    assert "checkpoint" in capsys.readouterr().out.lower()
    assert not ck.is_file()


@pytest.mark.slow
def test_lbfgs_resume_matches_uninterrupted(tmp_path, content_pil, style_pil):
    """L-BFGS twin of test_resume_matches_uninterrupted (VERDICT r4 #6): the
    full LBFGSState (circular (s, y) history, direction, step length) must
    round-trip through the .npz so a resumed run is bit-identical."""
    kw = dict(min_scale=64, end_scale=64, iterations=20, initial_iterations=20,
              optimizer="lbfgs", checkpoint_every=10)

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
    assert load_checkpoint(ck)["optimizer"] == "lbfgs"

    st_c = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=10)
    img_c = np.asarray(
        st_c.stylize(content_pil, [style_pil], checkpoint=str(ck),
                     resume=True, **kw)
    )
    np.testing.assert_array_equal(img_a, img_c)


@pytest.mark.slow
def test_cross_process_resume(tmp_path, content_pil, style_pil):
    """Save in one interpreter, resume in a fresh one (VERDICT r1 #8): the
    resumed trajectory must match an uninterrupted in-process run exactly."""
    import subprocess
    import sys
    from pathlib import Path

    kw = dict(min_scale=64, end_scale=64, iterations=20, initial_iterations=20)
    st_a = StyleTransfer(devices=1, weights=PARAMS, callback_chunk=10)
    img_a = np.asarray(st_a.stylize(content_pil, [style_pil], **kw))

    content_path = tmp_path / "c.png"
    style_path = tmp_path / "s.png"
    content_pil.save(content_path)
    style_pil.save(style_path)
    ck = tmp_path / "ck.npz"
    out = tmp_path / "resumed.npy"

    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from PIL import Image
from style_transfer_tpu.engine import StyleTransfer
from style_transfer_tpu.models.weights import random_params

kw = dict(min_scale=64, end_scale=64, iterations=20, initial_iterations=20,
          checkpoint={str(ck)!r}, checkpoint_every=10)
st = StyleTransfer(devices=1, weights=random_params(0), callback_chunk=10)
content = Image.open({str(content_path)!r})
style = Image.open({str(style_path)!r})
phase = {'{phase}'!r}
if phase == "save":
    class Stop(Exception): pass
    def interrupt(it):
        if it.i >= 10: raise Stop
    try:
        st.stylize(content, [style], callback=interrupt, **kw)
    except Stop:
        pass
else:
    img = np.asarray(st.stylize(content, [style], resume=True, **kw))
    np.save({str(out)!r}, img)
"""
    repo = Path(__file__).resolve().parent.parent
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = str(repo) + os.pathsep + env.get("PYTHONPATH", "")
    for phase in ("save", "resume"):
        proc = subprocess.run(
            [sys.executable, "-c", script.replace("{phase}", phase)],
            env=env, capture_output=True, text=True, timeout=560,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
    np.testing.assert_array_equal(img_a, np.load(out))


@pytest.mark.slow
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
