"""Width-paired early trunk (vgg paired_early) == standard trunk.

The paired formulation reshapes nothing semantically: conv1_1 emits
(N, H, W/2, 2C) pairs directly from a block-diagonal im2col matmul,
conv1_2 runs a (3,3,128,128) block conv whose kernel re-routes the
six live 64x64 blocks, and pool1 folds the pair max back to the
standard layout. Every tap, moment, loss and gradient must equal the
standard trunk up to float reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models.vgg import (
    PAIRED_LAST, extract_features, unpair_width,
)
from style_transfer_tpu.models.weights import random_params
from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.step import StepConfig, build_loss_fn


def _params():
    return {k: jnp.asarray(v) for k, v in random_params(0).items()}


@pytest.mark.parametrize("pooling", ["max", "average", "l2"])
def test_paired_features_match_standard(pooling):
    rng = np.random.RandomState(0)
    params = _params()
    image = jnp.asarray(rng.rand(1, 40, 56, 3).astype(np.float32))
    layers = [0, 1, 2, 3, 4, 6, 11]
    std = extract_features(params, image, layers, pooling=pooling)
    par = extract_features(params, image, layers, pooling=pooling,
                           paired_early=True)
    for l in layers:
        got = unpair_width(par[l]) if l <= PAIRED_LAST else par[l]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(std[l]), rtol=2e-5, atol=1e-5,
            err_msg=f"layer {l}")


def test_paired_moments_fold():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 6, 128).astype(np.float32))
    mean_p, srm_p = L.w2_moments_paired(x)
    mean_s, srm_s = L.w2_moments(unpair_width(x))
    np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_s),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(srm_p), np.asarray(srm_s),
                               rtol=1e-5, atol=1e-6)


def test_paired_odd_width_rejected():
    params = _params()
    image = jnp.zeros((1, 32, 33, 3), jnp.float32)
    with pytest.raises(ValueError, match="even input width"):
        extract_features(params, image, [1], paired_early=True)


def _consts(params, cfg, content, style):
    cf = extract_features(params, content, cfg.content_layers)
    sf = extract_features(params, style, cfg.style_layers)
    if cfg.style_loss == "w2":
        style_consts = {
            l: L.w2_target(*L.w2_moments(sf[l]), cfg.w2_eps, cfg.sqrtm_iters)
            for l in cfg.style_layers
        }
    else:
        style_consts = {l: L.gram_matrix(sf[l]) for l in cfg.style_layers}
    return {
        "content": {l: cf[l] for l in cfg.content_layers},
        "style": style_consts,
    }


@pytest.mark.parametrize(
    "style_loss,content_layers,n_bands,band_axis",
    [
        ("w2", (22,), 0, 0),      # default taps, monolithic
        ("gram", (22,), 0, 0),    # gram shares the folded moments
        ("w2", (3,), 0, 0),       # content tap INSIDE the paired region
        ("w2", (22,), 2, 0),      # banded rows + paired slabs
        ("w2", (22,), 2, 2),      # banded columns: pair-space slab slices
    ],
)
def test_paired_loss_grad_match(style_loss, content_layers, n_bands,
                                band_axis):
    rng = np.random.RandomState(2)
    h, w = 128, 96
    params = _params()
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))

    base = StepConfig(compute_dtype=None, style_loss=style_loss,
                      content_layers=content_layers,
                      content_weights=(0.015,) * len(content_layers))
    consts = _consts(params, base, content, style)
    paired = StepConfig(compute_dtype=None, style_loss=style_loss,
                        content_layers=content_layers,
                        content_weights=(0.015,) * len(content_layers),
                        paired_early=True, n_bands=n_bands,
                        band_axis=band_axis)

    lm, gm = jax.value_and_grad(build_loss_fn(base))(image, params, consts)
    lp, gp = jax.value_and_grad(build_loss_fn(paired))(image, params, consts)
    np.testing.assert_allclose(lp, lm, rtol=2e-5)
    # Paired matmuls reassociate the conv sums; near-zero grad elements see
    # absolute noise ~4e-7 (w2) / ~2e-5 (gram — the scaled-MSE quotient rule
    # amplifies srm reassociation noise through the conv transposes).
    atol = 2e-5 if style_loss == "gram" else 1e-6
    np.testing.assert_allclose(gp, gm, rtol=5e-4, atol=atol)
