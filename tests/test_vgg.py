"""VGG-19 feature extractor: golden parity against a PyTorch build of the
same architecture with identical weights (SURVEY.md §4.2 — torchvision itself
is unavailable offline, so the torch model is constructed from the same
layer spec the torchvision VGG-19 uses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn

from style_transfer_tpu.models.vgg import INPUT, extract_features, min_input_size
from style_transfer_tpu.models.weights import CONV_INDICES, POOL_INDICES, random_params


def build_torch_vgg(params, last_layer, pooling="max"):
    """torchvision-vgg19.features-equivalent stack from our HWIO params."""
    layers = []
    conv_set = set(CONV_INDICES)
    pool_set = set(POOL_INDICES)
    scales = {"max": 1.0, "average": 2.0, "l2": 0.78}

    class Scale(nn.Module):
        def __init__(self, mod, s):
            super().__init__()
            self.mod, self.s = mod, s

        def forward(self, x):
            return self.mod(x) * self.s

    for i in range(last_layer + 1):
        if i in conv_set:
            k = params[f"conv{i}_kernel"]  # HWIO
            b = params[f"conv{i}_bias"]
            cin, cout = k.shape[2], k.shape[3]
            conv = nn.Conv2d(cin, cout, 3, padding=1,
                             padding_mode="replicate" if i == 0 else "zeros")
            with torch.no_grad():
                conv.weight.copy_(torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy()))
                conv.bias.copy_(torch.from_numpy(b))
            layers.append(conv)
        elif i in pool_set:
            if pooling == "max":
                layers.append(nn.MaxPool2d(2))
            elif pooling == "average":
                layers.append(Scale(nn.AvgPool2d(2), scales["average"]))
            else:
                layers.append(Scale(nn.LPPool2d(2, 2), scales["l2"]))
        else:
            layers.append(nn.ReLU())
    return nn.Sequential(*layers).eval()


def torch_features(params, img_nhwc, layers, pooling="max"):
    model = build_torch_vgg(params, max(layers), pooling)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = torch.from_numpy(np.transpose(img_nhwc, (0, 3, 1, 2)).copy())
    x = (x - mean) / std
    feats = {}
    with torch.no_grad():
        for i, layer in enumerate(model):
            x = layer(x)
            if i in layers:
                feats[i] = np.transpose(x.numpy(), (0, 2, 3, 1))
    return feats


@pytest.fixture(scope="module")
def params_np():
    return random_params(0)


@pytest.fixture(scope="module")
def image():
    rng = np.random.RandomState(0)
    return rng.rand(1, 64, 96, 3).astype(np.float32)


@pytest.mark.parametrize("pooling", ["max", "average", "l2"])
def test_feature_parity_with_torch(params_np, image, pooling):
    taps = [1, 6, 11, 20, 22, 29]
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    ours = extract_features(params, jnp.asarray(image), taps, pooling=pooling)
    theirs = torch_features(params_np, image, taps, pooling=pooling)
    for l in taps:
        a, b = np.asarray(ours[l], np.float32), theirs[l]
        denom = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / denom < 2e-4, f"layer {l} mismatch ({pooling})"


def test_input_tap_is_raw(params_np, image):
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    feats = extract_features(params, jnp.asarray(image), [1])
    np.testing.assert_array_equal(np.asarray(feats[INPUT]), image)


def test_min_input_size_values():
    # pools at [4, 9, 18, 27, 36]: one factor of 2 per pool at/before last tap
    assert min_input_size([1]) == 1
    assert min_input_size([6]) == 2
    assert min_input_size([11]) == 4
    assert min_input_size([22]) == 8
    assert min_input_size([29]) == 16
    assert min_input_size([36]) == 32


def test_min_size_guard(params_np):
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    small = jnp.zeros((1, 8, 8, 3))
    with pytest.raises(ValueError, match="at least"):
        extract_features(params, small, [29])


def test_bf16_trunk_close_to_f32(params_np, image):
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    f32 = extract_features(params, jnp.asarray(image), [11])
    bf16 = extract_features(
        params, jnp.asarray(image), [11], compute_dtype=jnp.bfloat16
    )
    a = np.asarray(f32[11], np.float32)
    b = np.asarray(bf16[11], np.float32)
    # bf16 has ~3 decimal digits; feature maps should agree to ~2%
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-6) < 0.05


def test_feature_shape():
    from style_transfer_tpu.models.vgg import feature_shape

    assert feature_shape(1, 96, 128) == (96, 128, 64)   # relu1_1
    assert feature_shape(6, 96, 128) == (48, 64, 128)   # relu2_1
    assert feature_shape(11, 96, 128) == (24, 32, 256)
    assert feature_shape(22, 96, 128) == (12, 16, 512)  # relu4_2
    assert feature_shape(29, 96, 128) == (6, 8, 512)
    # matches actual activation shapes (floor semantics on odd dims)
    assert feature_shape(6, 51, 67) == (25, 33, 128)


def test_im2col_convgrad_matches_patch_backward():
    """vgg._conv_im2col_convgrad: identical forward; the conv-transpose
    backward must equal the patch-matrix autodiff backward (same math,
    different op) for input, kernel, and bias cotangents."""
    from style_transfer_tpu.models.vgg import (
        _conv_im2col, _conv_im2col_convgrad)

    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.randn(1, 18, 22, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 64, 128).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    g = jnp.asarray(rng.randn(1, 16, 20, 128).astype(np.float32))
    for flatten in (True, False):
        y1, vjp1 = jax.vjp(
            lambda x_, k_, b_: _conv_im2col(x_, k_, b_, flatten), xp, k, b)
        y2, vjp2 = jax.vjp(
            lambda x_, k_, b_: _conv_im2col_convgrad(x_, k_, b_, flatten),
            xp, k, b)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)
        for a, c in zip(vjp1(g), vjp2(g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-4)


def test_im2col_convgrad_step_trajectory_matches():
    """A short fused-step run with im2col_grad='conv' must track the
    default patch backward to float noise."""
    import __graft_entry__ as g

    kw = dict(n_h=48, n_w=64, im2col_layers=(10, 19, 28), n_bands=2,
              paired_early=True)
    r1, p1, c1, s1 = g._build(**kw)
    r2, p2, c2, s2 = g._build(im2col_grad="conv", **kw)
    s1, l1 = r1(p1, c1, s1, 5)
    s2, l2 = r2(p2, c2, s2, 5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-6)
    np.testing.assert_allclose(
        np.asarray(s1.image), np.asarray(s2.image), atol=2e-5)
