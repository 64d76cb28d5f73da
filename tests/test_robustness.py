"""Robustness / negative-path coverage: malformed inputs fail loudly and
early, edge configurations run."""

import numpy as np
import pytest
from PIL import Image

from style_transfer_tpu.engine import StyleTransfer
from style_transfer_tpu.models.weights import random_params
from style_transfer_tpu.step import StepConfig, build_loss_fn

PARAMS = random_params(0)


def eng(**kw):
    kw.setdefault("devices", 1)
    kw.setdefault("weights", PARAMS)
    kw.setdefault("callback_chunk", 5)
    return StyleTransfer(**kw)


def test_unknown_style_loss_rejected():
    cfg = StepConfig(style_loss="bogus", compute_dtype=None)
    with pytest.raises(ValueError, match="unknown style_loss"):
        build_loss_fn(cfg)


def test_unknown_optimizer_rejected(content_pil, style_pil):
    st = eng()
    with pytest.raises(ValueError, match="optimizer"):
        st.stylize(content_pil, [style_pil], optimizer="sgd",
                   min_scale=64, end_scale=64, iterations=1, initial_iterations=1)


def test_unknown_pooling_rejected():
    import jax.numpy as jnp

    from style_transfer_tpu.ops.pooling import pool2x2

    with pytest.raises(ValueError, match="pooling"):
        pool2x2(jnp.zeros((1, 4, 4, 3)), "median")


def test_image_too_small_for_style_layers():
    import jax.numpy as jnp

    from style_transfer_tpu.models.vgg import extract_features

    params = {k: jnp.asarray(v) for k, v in PARAMS.items()}
    with pytest.raises(ValueError, match="at least"):
        extract_features(params, jnp.zeros((1, 8, 8, 3)), [29])


def test_min_scale_clamped_to_end_scale(content_pil, style_pil):
    """min_scale > end_scale is clamped (reference behavior, ref :365)."""
    st = eng()
    its = []
    st.stylize(content_pil, [style_pil], min_scale=512, end_scale=64,
               iterations=3, initial_iterations=3, callback=its.append)
    assert {((i.w, i.h)) for i in its} == {(64, 48)}


def test_zero_save_every_like_reference_is_not_required(content_pil, style_pil, tmp_path):
    # engine runs fine with no callback at all
    st = eng()
    img = st.stylize(content_pil, [style_pil], min_scale=64, end_scale=64,
                     iterations=2, initial_iterations=2)
    assert img is not None


def test_grayscale_and_rgba_inputs(tmp_path):
    """Non-RGB inputs are converted on load (ICC path, ref cli.py:36)."""
    from style_transfer_tpu.io_color import load_image

    g = tmp_path / "g.png"
    Image.new("L", (70, 70), 128).save(g)
    a = tmp_path / "a.png"
    Image.new("RGBA", (70, 70), (10, 20, 30, 255)).save(a)
    st = eng()
    img = st.stylize(load_image(g), [load_image(a)], min_scale=64, end_scale=64,
                     iterations=2, initial_iterations=2)
    assert img.mode == "RGB"


def test_many_styles(content_pil):
    rng = np.random.RandomState(0)
    styles = [
        Image.fromarray(rng.randint(0, 255, (64 + 8 * i, 64, 3), np.uint8))
        for i in range(4)
    ]
    st = eng()
    its = []
    st.stylize(content_pil, styles, min_scale=64, end_scale=64,
               iterations=4, initial_iterations=4, callback=its.append)
    assert np.isfinite([i.loss for i in its]).all()


def test_negative_style_weights_blend(content_pil, style_pil):
    """Reference normalizes by sum of |w|; negative weights are legal
    ('subtract this style')."""
    from PIL import Image as PILImage

    style2 = PILImage.fromarray(
        np.random.RandomState(3).randint(0, 255, (64, 64, 3), np.uint8)
    )
    st = eng()
    its = []
    st.stylize(content_pil, [style_pil, style2], style_weights=[2.0, -1.0],
               min_scale=64, end_scale=64, iterations=4, initial_iterations=4,
               callback=its.append)
    assert np.isfinite([i.loss for i in its]).all()
