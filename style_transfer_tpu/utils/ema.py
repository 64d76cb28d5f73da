"""Bias-corrected exponential moving average as a functional state pytree.

Parity with the reference's ``EMA`` module
(``/root/reference/style_transfer/style_transfer.py:237-253``): Adam-style
bias correction ``value / (1 - accum)`` with ``accum *= decay`` per update,
seeded with the first value at init. Redesigned as a NamedTuple so it can be
carried through ``lax.scan`` inside the fused optimization step.
"""

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["EMAState", "ema_init", "ema_update", "ema_get"]


class EMAState(NamedTuple):
    value: jnp.ndarray
    accum: jnp.ndarray  # scalar, prod of decays so far


def ema_init(value, decay: float) -> EMAState:
    """Initialize with one update applied to a zero state (matches reference
    __init__, which constructs zeros then immediately calls update)."""
    zero = jnp.zeros_like(value)
    state = EMAState(value=zero, accum=jnp.asarray(1.0, jnp.float32))
    return ema_update(state, value, decay)


def ema_update(state: EMAState, value, decay: float) -> EMAState:
    d = jnp.asarray(decay, jnp.float32)
    return EMAState(
        value=state.value * d + (1.0 - d) * value,
        accum=state.accum * d,
    )


def ema_get(state: EMAState):
    return state.value / (1.0 - state.accum)
