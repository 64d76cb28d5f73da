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
