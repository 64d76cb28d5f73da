"""Loss semantics (SURVEY.md §4.1): TV stencil vs brute force, ScaledMSE,
Gram normalization, W2 properties (zero iff matching stats, linear target
blending)."""

import jax
import jax.numpy as jnp
import numpy as np

from style_transfer_tpu.ops import losses as L


def test_scaled_mse_grad_l1_norm_is_one():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(50).astype(np.float32))
    t = jnp.asarray(rng.randn(50).astype(np.float32))
    g = jax.grad(lambda v: L.scaled_mse(v, t))(x)
    # d/dx [sum(d^2)/sum|d|] = (2d*sum|d| - sum(d^2)*sign(d)) / sum|d|^2;
    # its L1 norm is ~1 for roughly symmetric d.
    assert 0.5 < float(jnp.sum(jnp.abs(g))) < 1.5


def test_scaled_mse_value():
    x = jnp.asarray([1.0, 2.0])
    t = jnp.asarray([0.0, 0.0])
    # sum(d^2)=5, sum|d|=3
    np.testing.assert_allclose(float(L.scaled_mse(x, t)), 5 / 3, rtol=1e-6)


def test_content_mse():
    x = jnp.ones((1, 4, 4, 3))
    t = jnp.zeros((1, 4, 4, 3))
    np.testing.assert_allclose(float(L.content_mse(x, t)), 1.0, rtol=1e-6)


def test_tv_loss_brute_force():
    rng = np.random.RandomState(1)
    img = rng.rand(1, 7, 9, 3).astype(np.float32)
    # Brute force: replicate pad, nine-point stencil per the documented
    # weighting (axis 1/3, diagonal 1/12, total x2).
    p = np.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    c = p[:, 1:-1, 1:-1]
    d1 = np.mean((p[:, 1:-1, 2:] - c) ** 2) / 3
    d2 = np.mean((p[:, 2:, 1:-1] - c) ** 2) / 3
    d3 = np.mean((p[:, 1:, 1:] - p[:, :-1, :-1]) ** 2) / 12
    d4 = np.mean((p[:, 1:, :-1] - p[:, :-1, 1:]) ** 2) / 12
    expected = 2 * (d1 + d2 + d3 + d4)
    np.testing.assert_allclose(float(L.tv_loss(jnp.asarray(img))), expected, rtol=1e-5)


def test_tv_loss_zero_for_constant():
    img = jnp.full((1, 8, 8, 3), 0.7)
    assert float(L.tv_loss(img)) == 0.0


def test_gram_normalization():
    rng = np.random.RandomState(2)
    f = rng.randn(1, 6, 5, 4).astype(np.float32)
    g = np.asarray(L.gram_matrix(jnp.asarray(f)))
    mat = f.reshape(1, 30, 4)[0]
    expected = mat.T @ mat / 30  # per-pixel-count normalization
    np.testing.assert_allclose(g[0], expected, rtol=1e-5)


def test_w2_zero_iff_matching_stats():
    rng = np.random.RandomState(3)
    f = jnp.asarray(rng.rand(1, 32, 32, 8).astype(np.float32))
    tgt = L.w2_target(*L.w2_moments(f))
    self_loss = float(L.w2_loss(f, tgt))
    assert abs(self_loss) < 1e-4
    f2 = jnp.asarray(rng.rand(1, 32, 32, 8).astype(np.float32) * 2.0 + 1.0)
    assert float(L.w2_loss(f2, tgt)) > 10 * abs(self_loss)


def test_w2_target_blending_is_linear():
    """(mean, srm) pairs combine linearly across style images — the property
    the reference exploits for --style-weights (ref :162-168)."""
    rng = np.random.RandomState(4)
    f1 = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))
    f2 = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))
    m1, s1 = L.w2_moments(f1)
    m2, s2 = L.w2_moments(f2)
    mixed_m, mixed_s = 0.3 * m1 + 0.7 * m2, 0.3 * s1 + 0.7 * s2
    # Equivalent to moments of the pooled weighted distribution:
    cat = jnp.concatenate(
        [jnp.repeat(f1.reshape(1, -1, 4), 3, axis=1),
         jnp.repeat(f2.reshape(1, -1, 4), 7, axis=1)], axis=1
    )[:, :, None, :].transpose(0, 1, 2, 3)
    mc = np.asarray(jnp.mean(cat, axis=(1, 2)))
    np.testing.assert_allclose(np.asarray(mixed_m), mc, rtol=1e-4)


def test_w2_mean_term():
    # Features with identical covariance but shifted mean: loss ~= mean diff^2
    rng = np.random.RandomState(5)
    base = rng.rand(1, 64, 64, 4).astype(np.float32)
    f1 = jnp.asarray(base)
    shift = np.array([0.5, 0.0, 0.0, 0.0], np.float32)
    f2 = jnp.asarray(base + shift)
    tgt = L.w2_target(*L.w2_moments(f1))
    loss = float(L.w2_loss(f2, tgt))
    expected = float(np.mean(shift ** 2))
    assert abs(loss - expected) < 0.05 * expected + 1e-3
