"""Pallas TPU kernels, validated on CPU via the Mosaic interpreter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from style_transfer_tpu.ops.sqrtm import sqrtm_ns, sqrtm_ns_lyap


def spd(n, seed, batch=None):
    rng = np.random.RandomState(seed)
    if batch:
        x = rng.randn(batch, n, n).astype(np.float32)
        return x @ np.transpose(x, (0, 2, 1)) / n + 1e-3 * np.eye(n, dtype=np.float32)
    x = rng.randn(n, n).astype(np.float32)
    return x @ x.T / n + 1e-3 * np.eye(n, dtype=np.float32)


def test_ns_pallas_forward_matches_xla():
    from style_transfer_tpu.ops.pallas.ns_sqrtm import sqrtm_ns_pallas

    a = jnp.asarray(spd(128, 0, batch=2))
    ref = np.asarray(sqrtm_ns(a, 12))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(sqrtm_ns_pallas(a, 12))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 5e-3


def test_ns_pallas_grad_matches_xla():
    from style_transfer_tpu.ops.pallas.ns_sqrtm import sqrtm_ns_lyap_pallas

    a = jnp.asarray(spd(64, 1))
    g = jnp.asarray(np.random.RandomState(2).randn(64, 64).astype(np.float32))
    ref = np.asarray(jax.grad(lambda m: jnp.sum(sqrtm_ns_lyap(m, 12) * g))(a))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            jax.grad(lambda m: jnp.sum(sqrtm_ns_lyap_pallas(m, 12) * g))(a)
        )
    assert np.abs(out - ref).max() / np.abs(ref).max() < 5e-3


def test_ns_pallas_unbatched_shape():
    from style_transfer_tpu.ops.pallas.ns_sqrtm import sqrtm_ns_pallas

    a = jnp.asarray(spd(32, 3))
    with pltpu.force_tpu_interpret_mode():
        out = sqrtm_ns_pallas(a, 10)
    assert out.shape == (32, 32)
