"""Matrix square root numerics (SURVEY.md §4.1): NS vs scipy vs eigh,
custom-VJP gradients vs autodiff of the eigh path, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from style_transfer_tpu.ops.sqrtm import sqrtm_eig, sqrtm_ns, sqrtm_ns_lyap


def spd(n, seed=0, eps=1e-3):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, n).astype(np.float32)
    return x @ x.T / n + eps * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("n", [8, 64, 256])
def test_ns_matches_scipy(n):
    a = spd(n)
    ref = scipy.linalg.sqrtm(a.astype(np.float64)).real
    out = np.asarray(sqrtm_ns(jnp.asarray(a), 20))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4


def test_eig_matches_scipy():
    a = spd(64)
    ref = scipy.linalg.sqrtm(a.astype(np.float64)).real
    out = np.asarray(sqrtm_eig(jnp.asarray(a)))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4


def test_square_recovers_input():
    a = spd(32, seed=3)
    z = np.asarray(sqrtm_ns(jnp.asarray(a), 20), np.float64)
    assert np.abs(z @ z - a).max() < 1e-3


def test_batched():
    mats = np.stack([spd(16, s) for s in range(4)])
    out = np.asarray(sqrtm_ns(jnp.asarray(mats), 20))
    for i in range(4):
        ref = scipy.linalg.sqrtm(mats[i].astype(np.float64)).real
        assert np.abs(out[i] - ref).max() / np.abs(ref).max() < 1e-4


def test_lyap_grad_matches_eigh_grad():
    a = spd(32, seed=1, eps=1e-2)
    g = np.random.RandomState(2).randn(32, 32).astype(np.float32)
    g1 = np.asarray(jax.grad(lambda m: jnp.sum(sqrtm_ns_lyap(m, 20) * g))(jnp.asarray(a)))
    g2 = np.asarray(jax.grad(lambda m: jnp.sum(sqrtm_eig(m) * g))(jnp.asarray(a)))
    assert np.abs(g1 - g2).max() / np.abs(g2).max() < 1e-3


def test_lyap_grad_finite_differences():
    n = 8
    a = spd(n, seed=4, eps=1e-1).astype(np.float64).astype(np.float32)
    f = lambda m: jnp.sum(sqrtm_ns_lyap(m, 25))
    g = np.asarray(jax.grad(f)(jnp.asarray(a)))
    rng = np.random.RandomState(5)
    d = rng.randn(n, n).astype(np.float32) * 1e-3
    d = (d + d.T) / 2
    fd = float(f(jnp.asarray(a + d))) - float(f(jnp.asarray(a - d)))
    analytic = 2 * float(np.sum(g * d))
    assert abs(fd - analytic) / (abs(fd) + 1e-12) < 5e-2


def test_forward_only_saves_result_not_iterates():
    # The custom VJP's residual is the result itself: jitting grad must work
    # under scan (memory-light path used by the engine's fused step).
    a = jnp.asarray(spd(16))

    def body(carry, _):
        loss = jnp.sum(sqrtm_ns_lyap(carry, 12))
        return carry, loss

    _, losses = jax.lax.scan(body, a, None, length=3)
    assert np.isfinite(np.asarray(losses)).all()


def test_invalid_shapes():
    with pytest.raises(ValueError):
        sqrtm_ns(jnp.ones((3,)))
    with pytest.raises(ValueError):
        sqrtm_ns(jnp.ones((3, 4)))
    with pytest.raises(ValueError):
        sqrtm_ns(jnp.eye(3), -1)


def test_trace_sqrtm_value_and_grad():
    """trace_sqrtm_ns == trace(sqrtm); its analytic VJP (A^{-1/2}/2) matches
    autodiff of the eigh oracle and the Lyapunov path."""
    from style_transfer_tpu.ops.sqrtm import trace_sqrtm_ns

    a = jnp.asarray(spd(64, seed=3, eps=1e-2))
    v1 = float(trace_sqrtm_ns(a, 20))
    v2 = float(jnp.trace(sqrtm_eig(a)))
    assert abs(v1 - v2) / abs(v2) < 1e-4

    g1 = np.asarray(jax.grad(lambda m: trace_sqrtm_ns(m, 20))(a))
    g2 = np.asarray(jax.grad(lambda m: jnp.trace(sqrtm_eig(m)))(a))
    g3 = np.asarray(jax.grad(lambda m: jnp.trace(sqrtm_ns_lyap(m, 20)))(a))
    assert np.abs(g1 - g2).max() / np.abs(g2).max() < 1e-3
    assert np.abs(g1 - g3).max() / np.abs(g3).max() < 1e-3


def test_trace_sqrtm_batched():
    from style_transfer_tpu.ops.sqrtm import trace_sqrtm_ns

    mats = jnp.asarray(np.stack([spd(32, seed=s, eps=1e-2) for s in range(3)]))
    out = np.asarray(trace_sqrtm_ns(mats, 20))
    assert out.shape == (3,)
    for i in range(3):
        ref = np.trace(scipy.linalg.sqrtm(np.asarray(mats[i], np.float64)).real)
        assert abs(out[i] - ref) / abs(ref) < 1e-4


def test_trace_sqrtm_pallas_interpret_matches():
    from style_transfer_tpu.ops.pallas.ns_sqrtm import trace_sqrtm_ns_pallas
    from style_transfer_tpu.ops.sqrtm import trace_sqrtm_ns
    from jax.experimental.pallas import tpu as pltpu

    mats = jnp.asarray(np.stack([spd(32, seed=s, eps=1e-2) for s in range(2)]))
    with pltpu.force_tpu_interpret_mode():
        v_p = np.asarray(trace_sqrtm_ns_pallas(mats, 12))
        g_p = np.asarray(jax.grad(
            lambda m: jnp.sum(trace_sqrtm_ns_pallas(m, 12)))(mats))
    v_x = np.asarray(trace_sqrtm_ns(mats, 12))
    g_x = np.asarray(jax.grad(lambda m: jnp.sum(trace_sqrtm_ns(m, 12)))(mats))
    np.testing.assert_allclose(v_p, v_x, rtol=1e-5)
    # The kernel's bf16x3 HIGH emulation differs from XLA's 3-pass HIGH at
    # the last few bits; A^{-1/2} amplifies that on small eigenvalues.
    np.testing.assert_allclose(g_p, g_x, rtol=2e-3, atol=3e-4)
