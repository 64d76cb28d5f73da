"""Bias-corrected EMA semantics (reference style_transfer.py:237-253)."""

import jax.numpy as jnp
import numpy as np

from style_transfer_tpu.utils.ema import ema_get, ema_init, ema_update


def test_first_value_debiases_to_itself():
    x = jnp.asarray([1.0, 2.0, 3.0])
    state = ema_init(x, 0.99)
    np.testing.assert_allclose(np.asarray(ema_get(state)), np.asarray(x), rtol=1e-6)


def test_matches_manual_recurrence():
    decay = 0.9
    rng = np.random.RandomState(0)
    xs = rng.randn(10, 4).astype(np.float32)
    state = ema_init(jnp.asarray(xs[0]), decay)
    value, accum = xs[0] * (1 - decay), decay
    for x in xs[1:]:
        state = ema_update(state, jnp.asarray(x), decay)
        value = value * decay + (1 - decay) * x
        accum *= decay
    np.testing.assert_allclose(
        np.asarray(ema_get(state)), value / (1 - accum), rtol=1e-5
    )


def test_converges_to_constant():
    x = jnp.full((3,), 5.0)
    state = ema_init(x, 0.5)
    for _ in range(20):
        state = ema_update(state, x, 0.5)
    np.testing.assert_allclose(np.asarray(ema_get(state)), 5.0, rtol=1e-6)
