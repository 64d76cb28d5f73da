"""Banded (halo-slab) loss path == monolithic loss path.

The banded trunk (ops/banded.py) must reproduce the monolithic objective and
its gradient exactly (up to float reassociation): the crop logic guarantees
every owned feature row is computed from uncontaminated context.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models.vgg import extract_features
from style_transfer_tpu.models.weights import random_params
from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.ops.banded import band_bounds, pool_stride, receptive_halo
from style_transfer_tpu.step import StepConfig, build_loss_fn


def test_receptive_halo_values():
    # The quantum is the deepest layer's own pool stride (slab starts only
    # need that layer's pooling-grid alignment), so the default pool2-cut
    # halo is the EXACT radius 8 — not 16 (measured -3.4%/iter at 6 Mpx,
    # trajectories identical; see receptive_halo docstring).
    assert receptive_halo([1]) == 1  # radius 1, stride 1
    assert receptive_halo([1, 6, 9]) == 8  # default banded set: exact
    assert receptive_halo([9]) == 8
    # Full default stack to relu5_1: RF size 156 -> radius 78 -> 80.
    assert receptive_halo([1, 6, 11, 20, 29]) == 80
    assert receptive_halo([22]) == 48  # relu4_2: RF size 84 -> radius 42 -> 48
    # sanity: halos are multiples of their layer's pool stride
    for layers in ([1], [6], [11], [20], [22], [29]):
        assert receptive_halo(layers) % pool_stride(layers[0]) == 0


def test_band_bounds_alignment():
    bounds = band_bounds(2172, 4)
    assert bounds[0] == 0 and bounds[-1] == 2172
    assert all(b % 16 == 0 for b in bounds[1:-1])
    assert len(bounds) == 5
    # Degenerate: more bands than quanta collapses gracefully.
    assert band_bounds(48, 9) == (0, 16, 32, 48)
    assert band_bounds(20, 3) == (0, 20)


def test_pool_stride():
    assert pool_stride(1) == 1
    assert pool_stride(6) == 2
    assert pool_stride(11) == 4
    assert pool_stride(20) == 8
    assert pool_stride(22) == 8
    assert pool_stride(29) == 16


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
    "style_loss,content_loss,band_cut",
    [
        ("w2", "mse", 9),     # hybrid: band through pool2, deep trunk whole
        ("gram", "scaled", 9),
        ("w2", "mse", 29),    # cut past the last tap = full-trunk banding
        ("w2", "mse", 18),    # cut at pool3: content layer 22 in stage 2
    ],
)
def test_banded_matches_monolithic(style_loss, content_loss, band_cut):
    rng = np.random.RandomState(0)
    h, w = 256, 96
    params = {k: jnp.asarray(v) for k, v in random_params(0).items()}
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))

    base = StepConfig(compute_dtype=None, style_loss=style_loss,
                      content_loss=content_loss)
    consts = _consts(params, base, content, style)

    # With 2 bands of 128 rows both interior slab edges really exercise
    # the crop (hybrid exact halo 8: slabs [0,136) and [120,256);
    # full-trunk halo 80: [0,208) and [48,256)).
    banded = StepConfig(compute_dtype=None, style_loss=style_loss,
                        content_loss=content_loss, n_bands=2,
                        band_cut=band_cut)
    loss_m = build_loss_fn(base)
    loss_b = build_loss_fn(banded)

    lm, gm = jax.value_and_grad(loss_m)(image, params, consts)
    lb, gb = jax.value_and_grad(loss_b)(image, params, consts)
    np.testing.assert_allclose(lb, lm, rtol=2e-5)
    np.testing.assert_allclose(gb, gm, rtol=5e-4, atol=1e-7)


@pytest.mark.parametrize(
    "h,w,n_bands,n_bands_w,paired",
    [
        (256, 96, 4, 0, False),   # plain row scan
        (256, 96, 5, 0, False),   # uneven interior split (15 quanta / 5)
        (250, 93, 4, 0, False),   # sub-quantum tail rows in the last band
        (256, 128, 4, 2, False),  # 2D grid: columns unrolled inside body
        (256, 128, 4, 2, True),   # + width-paired early trunk
    ],
)
def test_banded_scan_matches_unrolled(h, w, n_bands, n_bands_w, paired):
    """band_scan=True (interior bands under lax.scan) == the unrolled
    banded path == the monolithic path, loss and grad."""
    rng = np.random.RandomState(1)
    params = {k: jnp.asarray(v) for k, v in random_params(0).items()}
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    base = StepConfig(compute_dtype=None)
    consts = _consts(params, base, content, style)
    kw = dict(compute_dtype=None, n_bands=n_bands, n_bands_w=n_bands_w,
              paired_early=paired)
    unrolled = StepConfig(**kw)
    scanned = StepConfig(band_scan=True, **kw)
    lm, gm = jax.value_and_grad(build_loss_fn(base))(image, params, consts)
    lu, gu = jax.value_and_grad(build_loss_fn(unrolled))(image, params, consts)
    ls, gs = jax.value_and_grad(build_loss_fn(scanned))(image, params, consts)
    np.testing.assert_allclose(ls, lm, rtol=2e-5)
    np.testing.assert_allclose(gs, gm, rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(ls, lu, rtol=2e-5)


def test_banded_odd_dims_match():
    """H not a multiple of the band quantum and odd W: bounds quantize,
    floor-pooling still matches the monolithic trunk row-for-row."""
    rng = np.random.RandomState(2)
    h, w = 250, 93
    params = {k: jnp.asarray(v) for k, v in random_params(0).items()}
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    base = StepConfig(compute_dtype=None)
    consts = _consts(params, base, content, style)
    banded = StepConfig(compute_dtype=None, n_bands=2)
    lm, gm = jax.value_and_grad(build_loss_fn(base))(image, params, consts)
    lb, gb = jax.value_and_grad(build_loss_fn(banded))(image, params, consts)
    np.testing.assert_allclose(lb, lm, rtol=2e-5)
    np.testing.assert_allclose(gb, gm, rtol=5e-4, atol=1e-7)


@pytest.mark.slow
def test_banded_remat_matches():
    rng = np.random.RandomState(1)
    params = {k: jnp.asarray(v) for k, v in random_params(0).items()}
    image = jnp.asarray(rng.rand(1, 256, 96, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, 256, 96, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    base = StepConfig(compute_dtype=None)
    consts = _consts(params, base, content, style)
    banded = StepConfig(compute_dtype=None, n_bands=3, remat=True)
    lm, gm = jax.value_and_grad(jax.jit(build_loss_fn(base)))(
        image, params, consts)
    lb, gb = jax.value_and_grad(jax.jit(build_loss_fn(banded)))(
        image, params, consts)
    np.testing.assert_allclose(lb, lm, rtol=2e-5)
    # Recompute-for-backward reorders float ops; near-zero gradient elements
    # see absolute noise ~1e-6.
    np.testing.assert_allclose(gb, gm, rtol=5e-4, atol=3e-6)


def test_banded_columns_match():
    """Column banding (axis=2) == monolithic: slab WIDTH is what stays
    small, for the giant-width scales where row slabs span the full W."""
    rng = np.random.RandomState(3)
    h, w = 96, 256
    params = {k: jnp.asarray(v) for k, v in random_params(0).items()}
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    base = StepConfig(compute_dtype=None)
    consts = _consts(params, base, content, style)
    banded = StepConfig(compute_dtype=None, n_bands=2, band_axis=2)
    lm, gm = jax.value_and_grad(build_loss_fn(base))(image, params, consts)
    lb, gb = jax.value_and_grad(build_loss_fn(banded))(image, params, consts)
    np.testing.assert_allclose(lb, lm, rtol=2e-5)
    np.testing.assert_allclose(gb, gm, rtol=5e-4, atol=1e-7)


@pytest.mark.parametrize(
    "h,w,paired,content_loss",
    [
        (256, 192, False, "mse"),   # 2x2 grid, exact quanta
        (250, 198, False, "mse"),   # ragged dims (odd W: paired ineligible)
        (256, 192, True, "scaled"),  # width-paired early trunk on 2D slabs
    ],
)
def test_banded_2d_grid_matches(h, w, paired, content_loss):
    """2D (rows x columns) halo-slab grid == monolithic, loss and grad —
    squarer slabs for giant-width canvases where row slabs span the full W."""
    rng = np.random.RandomState(5)
    params = {k: jnp.asarray(v) for k, v in random_params(0).items()}
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    base = StepConfig(compute_dtype=None, content_loss=content_loss)
    consts = _consts(params, base, content, style)
    banded = StepConfig(compute_dtype=None, content_loss=content_loss,
                        n_bands=2, n_bands_w=2, paired_early=paired)
    lm, gm = jax.value_and_grad(build_loss_fn(base))(image, params, consts)
    lb, gb = jax.value_and_grad(build_loss_fn(banded))(image, params, consts)
    np.testing.assert_allclose(lb, lm, rtol=2e-5)
    np.testing.assert_allclose(gb, gm, rtol=5e-4, atol=1e-7)


def test_banded_2d_early_content_tap():
    """2D grid with a content layer inside the banded region (layer 6):
    the 2D target slicing path."""
    rng = np.random.RandomState(6)
    h, w = 192, 256
    params = {k: jnp.asarray(v) for k, v in random_params(0).items()}
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    base = StepConfig(compute_dtype=None, content_layers=(6, 22),
                      content_weights=(0.01, 0.015))
    consts = _consts(params, base, content, style)
    banded = StepConfig(compute_dtype=None, content_layers=(6, 22),
                        content_weights=(0.01, 0.015), n_bands=2,
                        n_bands_w=3)
    lm, gm = jax.value_and_grad(build_loss_fn(base))(image, params, consts)
    lb, gb = jax.value_and_grad(build_loss_fn(banded))(image, params, consts)
    np.testing.assert_allclose(lb, lm, rtol=2e-5)
    np.testing.assert_allclose(gb, gm, rtol=5e-4, atol=1e-7)


def test_banded_columns_odd_width_match():
    """Explicit column banding with non-quantum W: bounds quantize,
    floor pooling still matches the monolithic trunk column-for-column."""
    rng = np.random.RandomState(4)
    h, w = 96, 250
    params = {k: jnp.asarray(v) for k, v in random_params(0).items()}
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    base = StepConfig(compute_dtype=None)
    consts = _consts(params, base, content, style)
    # Not wide enough for auto-columns; explicit axis=2 with odd W still
    # matches (bounds quantize, floor pooling).
    banded = StepConfig(compute_dtype=None, n_bands=3, band_axis=2)
    lm, gm = jax.value_and_grad(build_loss_fn(base))(image, params, consts)
    lb, gb = jax.value_and_grad(build_loss_fn(banded))(image, params, consts)
    np.testing.assert_allclose(lb, lm, rtol=2e-5)
    np.testing.assert_allclose(gb, gm, rtol=5e-4, atol=1e-7)


def test_banded_forward_cut_matches_monolithic():
    """banded_forward_cut (target-capture path, engine._features at print
    sizes) reproduces the monolithic pool2 activation exactly."""
    from style_transfer_tpu.ops.banded import banded_forward_cut

    rng = np.random.RandomState(5)
    params = {k: jnp.asarray(v) for k, v in random_params(0).items()}
    image = jnp.asarray(rng.rand(1, 160, 96, 3).astype(np.float32))

    def early_fn(slab):
        return extract_features(params, slab, (9,))

    cut_b = banded_forward_cut(early_fn, image, n_bands=3)
    cut_m = extract_features(params, image, (9,))[9]
    assert cut_b.shape == cut_m.shape
    np.testing.assert_allclose(np.asarray(cut_b), np.asarray(cut_m),
                               rtol=2e-5, atol=1e-6)


def test_engine_style_stats_banded_matches_monolithic(vgg_params):
    """The engine's banded style-statistics capture equals the monolithic
    one (forced via the private knob — CPU auto never bands)."""
    from style_transfer_tpu.engine import StyleTransfer

    rng = np.random.RandomState(6)
    style = rng.rand(1, 160, 96, 3).astype(np.float32)

    st = StyleTransfer(devices=1, weights=vgg_params)
    mono = jax.device_get(st._style_stats(style, "w2"))

    st2 = StyleTransfer(devices=1, weights=vgg_params)
    st2._is_tpu = True  # let _n_bands honor the explicit band count
    st2.n_bands = 3
    assert st2._n_bands(160, 96) == 3
    band = jax.device_get(st2._style_stats(style, "w2"))

    for layer in mono:
        for a, b in zip(mono[layer], band[layer]):
            np.testing.assert_allclose(b, a, rtol=3e-5, atol=1e-6)


def test_engine_features_banded_matches_monolithic(vgg_params):
    """The engine's banded content-target capture equals the monolithic one."""
    from style_transfer_tpu.engine import StyleTransfer

    rng = np.random.RandomState(7)
    content = rng.rand(1, 160, 96, 3).astype(np.float32)

    st = StyleTransfer(devices=1, weights=vgg_params)
    st._is_tpu = True  # same im2col/pool knobs as the banded run
    st.n_bands = 0
    mono = jax.device_get(st._features(content, [22]))

    st2 = StyleTransfer(devices=1, weights=vgg_params)
    st2._is_tpu = True
    st2.n_bands = 3
    band = jax.device_get(st2._features(content, [22]))

    np.testing.assert_allclose(band[22], mono[22], rtol=3e-5, atol=1e-6)


def test_srm_outer_custom_vjp():
    """losses.srm_outer: HIGH-precision forward, single-pass backward —
    values and gradients must match the plain einsum (exactly on CPU,
    where precision flags are no-ops)."""
    from style_transfer_tpu.ops.losses import srm_outer

    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.normal(size=(2, 7, 5, 4)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 4, 4)).astype(np.float32))
    ref = lambda x: jnp.einsum("nhwc,nhwd->ncd", x, x)
    np.testing.assert_allclose(srm_outer(u), ref(u), rtol=1e-6)
    gn = jax.grad(lambda x: jnp.sum(srm_outer(x) * g))(u)
    gr = jax.grad(lambda x: jnp.sum(ref(x) * g))(u)
    np.testing.assert_allclose(gn, gr, rtol=1e-5, atol=1e-6)
