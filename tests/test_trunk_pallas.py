"""Fused Pallas early-trunk kernel vs the monolithic XLA trunk.

Runs on CPU via the Mosaic interpreter in f32 (banding/kernels only
reassociate float sums, so tolerances are tight). Reference semantics:
conv1_1 replicate pad + zero-pad SAME convs + floor 2x2 max pooling
(/root/reference/style_transfer/style_transfer.py:20-90).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models.vgg import extract_features
from style_transfer_tpu.models.weights import random_params
from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.ops.pallas.trunk import early_trunk_stats

PARAMS = {k: jnp.asarray(v) for k, v in random_params(0).items()}


def _ref_outputs(image):
    """Monolithic-trunk cut + moments (pool_impl='xla' = select-and-scatter
    gradient routing, which the kernel's first-max unpool matches)."""
    feats = extract_features(PARAMS, image, [1, 6, 9], pool_impl="xla")
    moments = {l: L.w2_moments(feats[l]) for l in (1, 6)}
    return feats[9], moments


def _flat_loss(cut, moments):
    """A scalar mixing every output so one grad check covers all paths."""
    total = jnp.sum(cut.astype(jnp.float32) * 1e-3)
    for l, (mean, srm) in moments.items():
        total = total + jnp.sum(mean * (l + 1.0)) + jnp.sum(srm * 0.5)
    return total


@pytest.mark.parametrize(
    "h,w",
    [
        (64, 64),  # single tile, exact fit
        (96, 160),  # multi-tile, exact fit
        (100, 92),  # ragged tiles, odd pooling cascade
        (250, 70),  # tall ragged
    ],
)
def test_forward_matches_monolithic(h, w):
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    cut_ref, mom_ref = _ref_outputs(image)
    cut, mom = early_trunk_stats(
        PARAMS, image, compute_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(cut), np.asarray(cut_ref), rtol=1e-4, atol=1e-5
    )
    for l in (1, 6):
        np.testing.assert_allclose(
            np.asarray(mom[l][0]), np.asarray(mom_ref[l][0]), rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mom[l][1]), np.asarray(mom_ref[l][1]), rtol=1e-4,
            atol=1e-5,
        )


@pytest.mark.parametrize("h,w", [(96, 160), (100, 92)])
def test_grad_matches_monolithic(h, w):
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))

    def loss_ref(img):
        return _flat_loss(*_ref_outputs(img))

    def loss_pallas(img):
        return _flat_loss(*early_trunk_stats(
            PARAMS, img, compute_dtype=jnp.float32, interpret=True
        ))

    lr, gr = jax.value_and_grad(loss_ref)(image)
    lp, gp = jax.value_and_grad(loss_pallas)(image)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gr), rtol=5e-4, atol=1e-6
    )


def test_conv_impl_ky3_matches(h=100, w=92):
    """CONV_IMPL='ky3' (per-ky matmuls, output-row-shift accumulation; no
    input lane-concat) computes the same trunk as the 'concat' formulation.
    Tolerances are f32-reassociation loose: the ky partial sums associate
    differently."""
    import style_transfer_tpu.ops.pallas.trunk as trunk

    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))

    def run():
        cut, mom = early_trunk_stats(
            PARAMS, image, compute_dtype=jnp.float32, interpret=True
        )
        g = jax.grad(lambda im: _flat_loss(*early_trunk_stats(
            PARAMS, im, compute_dtype=jnp.float32, interpret=True
        )))(image)
        return cut, mom, g

    assert trunk.CONV_IMPL == "concat"
    cut0, mom0, g0 = run()
    trunk.CONV_IMPL = "ky3"
    try:
        cut1, mom1, g1 = run()
    finally:
        trunk.CONV_IMPL = "concat"
    np.testing.assert_allclose(
        np.asarray(cut1), np.asarray(cut0), rtol=1e-4, atol=1e-4
    )
    for l in (1, 6):
        for a, b in zip(mom1[l], mom0[l]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )
    # Gradients: the changed f32 association can flip which element wins a
    # near-tied max-pool window, rerouting that window's whole cotangent —
    # an O(1) localized difference that is correct for both orderings.
    # Require elementwise agreement outside a small flip budget.
    g0, g1 = np.asarray(g0), np.asarray(g1)
    mismatch = np.abs(g1 - g0) > 1e-4 + 1e-4 * np.abs(g0)
    assert mismatch.mean() < 0.01, f"{mismatch.sum()}/{mismatch.size}"


@pytest.mark.parametrize("h,w", [(96, 160), (100, 92)])
def test_pool_bwd_stored_matches(h, w):
    """POOL_BWD='stored' (first-max quadrant index recorded by the forward)
    routes pool cotangents identically to the recompute formulation."""
    import style_transfer_tpu.ops.pallas.trunk as trunk

    rng = np.random.RandomState(11)
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))

    def run():
        return jax.value_and_grad(lambda im: _flat_loss(*early_trunk_stats(
            PARAMS, im, compute_dtype=jnp.float32, interpret=True
        )))(image)

    assert trunk.POOL_BWD == "recompute"
    l0, g0 = run()
    trunk.POOL_BWD = "stored"
    try:
        l1, g1 = run()
    finally:
        trunk.POOL_BWD = "recompute"
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("tile,h,w", [(128, 160, 192), (128, 100, 92),
                                      (32, 96, 160)])
def test_tile_size_matches(tile, h, w):
    """Non-default owned-tile sizes compute identical outputs and grads."""
    rng = np.random.RandomState(7)
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))

    def loss_with(t):
        return jax.value_and_grad(lambda im: _flat_loss(*early_trunk_stats(
            PARAMS, im, compute_dtype=jnp.float32, interpret=True, tile=t
        )))(image)

    l0, g0 = loss_with(64)
    l1, g1 = loss_with(tile)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=5e-4, atol=1e-5)


def test_grad_w2_loss_path(h=96, w=96):
    """End-to-end W2 loss gradient through the kernel (the real use)."""
    rng = np.random.RandomState(2)
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    sf = extract_features(PARAMS, style, [1, 6])
    targets = {
        l: L.w2_target(*L.w2_moments(sf[l]), 1e-4, 12) for l in (1, 6)
    }

    def w2_from(moments):
        total = 0.0
        for l in (1, 6):
            mean, srm = moments[l]
            cov = L.moments_to_cov(mean, srm, 1e-4)
            losses = L.w2_losses_batched(
                mean[0][None], cov[0][None],
                L.W2Target(
                    mean=targets[l].mean[0][None],
                    cov=targets[l].cov[0][None],
                    cov_sqrt=targets[l].cov_sqrt[0][None],
                ),
                12,
            )
            total = total + jnp.sum(losses)
        return total

    def loss_ref(img):
        feats = extract_features(PARAMS, img, [1, 6], pool_impl="xla")
        return w2_from({l: L.w2_moments(feats[l]) for l in (1, 6)})

    def loss_pallas(img):
        _, mom = early_trunk_stats(
            PARAMS, img, compute_dtype=jnp.float32, interpret=True
        )
        return w2_from(mom)

    lr, gr = jax.value_and_grad(loss_ref)(image)
    lp, gp = jax.value_and_grad(loss_pallas)(image)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-4)
    # atol covers sqrtm-chain amplification of f32 reassociation on
    # near-zero gradient entries (observed: 2/27k elements at ~1e-6).
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gr), rtol=1e-3, atol=5e-6
    )


def test_step_loss_fn_pallas_trunk_matches():
    """build_loss_fn(trunk_impl='pallas') == monolithic, loss and grad."""
    from style_transfer_tpu.step import StepConfig, build_loss_fn
    from style_transfer_tpu.models.vgg import extract_features as ef

    rng = np.random.RandomState(4)
    h, w = 100, 92
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    base = StepConfig(compute_dtype=None, maxpool_impl="xla")
    cf = ef(PARAMS, content, base.content_layers)
    sf = ef(PARAMS, style, base.style_layers)
    consts = {
        "content": {l: cf[l] for l in base.content_layers},
        "style": {
            l: L.w2_target(*L.w2_moments(sf[l]), base.w2_eps, base.sqrtm_iters)
            for l in base.style_layers
        },
    }
    pallas_cfg = StepConfig(compute_dtype=None, maxpool_impl="xla",
                            trunk_impl="pallas")
    lm, gm = jax.value_and_grad(build_loss_fn(base))(image, PARAMS, consts)
    lp, gp = jax.value_and_grad(build_loss_fn(pallas_cfg))(
        image, PARAMS, consts)
    np.testing.assert_allclose(float(lp), float(lm), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gm),
                               rtol=1e-3, atol=5e-6)


def test_step_loss_fn_pallas_trunk_gram():
    """The gram style loss shares the moments path through the kernel."""
    from style_transfer_tpu.step import StepConfig, build_loss_fn
    from style_transfer_tpu.models.vgg import extract_features as ef

    rng = np.random.RandomState(5)
    h, w = 96, 96
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    base = StepConfig(compute_dtype=None, maxpool_impl="xla",
                      style_loss="gram")
    cf = ef(PARAMS, content, base.content_layers)
    sf = ef(PARAMS, style, base.style_layers)
    consts = {
        "content": {l: cf[l] for l in base.content_layers},
        "style": {l: L.w2_moments(sf[l])[1] for l in base.style_layers},
    }
    pallas_cfg = StepConfig(compute_dtype=None, maxpool_impl="xla",
                            style_loss="gram", trunk_impl="pallas")
    lm, gm = jax.value_and_grad(build_loss_fn(base))(image, PARAMS, consts)
    lp, gp = jax.value_and_grad(build_loss_fn(pallas_cfg))(
        image, PARAMS, consts)
    np.testing.assert_allclose(float(lp), float(lm), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gm),
                               rtol=1e-3, atol=5e-6)
