"""Pallas TPU kernel: fused 2x2/2 max pooling, forward + backward.

Why this exists: XLA lowers max-pool's gradient to ``select_and_scatter``
(~2.3 ms/iter at 512px on a v5e) and brackets the pool with full-tensor
layout copies — together about a quarter of the fused optimization step.

Mosaic has no strided vector slices, so the windowing is expressed with
layout-legal ops only:

* W pairing: the caller reshapes ``(N, H, W, C) -> (N, H, W/2, 2C)`` (row-
  major view: the two pixels of a W pair become adjacent lane blocks), and
  the kernel slices lanes ``[:C]`` / ``[C:]`` — stride-1 slices.
* H pairing: the kernel reshapes its ``(2*TH, wp, 2C)`` block to
  ``(TH, 2, wp, 2C)`` — a leading-dim split, free in Mosaic — and indexes
  the pair axis.

Backward routes the cotangent through an equality mask with even tie
splitting (a valid subgradient; PyTorch picks the first winner, differing
only on exact ties such as post-ReLU zeros), rebuilding the input layout
with lane concatenation + leading-dim stacking. No select_and_scatter, no
scatter, no strided ops.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["max_pool2x2_pallas"]


def _fwd_kernel(x_ref, y_ref, *, c):
    x = x_ref[0]  # (2*TH, wp, 2C)
    th2, wp, _ = x.shape
    v = x.reshape(th2 // 2, 2, wp, 2 * c)
    m = jnp.maximum(v[:, 0], v[:, 1])  # (TH, wp, 2C)
    y_ref[0] = jnp.maximum(m[..., :c], m[..., c:])  # (TH, wp, C)


def _bwd_kernel(x_ref, y_ref, g_ref, gx_ref, *, c):
    x = x_ref[0]  # (2*TH, wp, 2C)
    y = y_ref[0]  # (TH, wp, C)
    g = g_ref[0]
    th2, wp, _ = x.shape
    th = th2 // 2
    v = x.reshape(th, 2, wp, 2 * c)
    corners = (
        v[:, 0, :, :c], v[:, 0, :, c:],  # (h even, w even), (h even, w odd)
        v[:, 1, :, :c], v[:, 1, :, c:],
    )
    # Compare in f32: some TPU targets reject bf16 vector equality, and the
    # upcast is exact for bf16 values.
    yf = y.astype(jnp.float32)
    masks = [(cnr.astype(jnp.float32) == yf).astype(g.dtype) for cnr in corners]
    ties = masks[0] + masks[1] + masks[2] + masks[3]
    gg = g / ties
    g00, g01, g10, g11 = (m * gg for m in masks)
    row0 = jnp.concatenate([g00, g01], axis=-1)  # (TH, wp, 2C) — lane concat
    row1 = jnp.concatenate([g10, g11], axis=-1)
    out = jnp.stack([row0, row1], axis=1)  # (TH, 2, wp, 2C) — leading stack
    gx_ref[0] = out.reshape(th2, wp, 2 * c)


def _pick_th(hp, wp, c, dtype_bytes, budget=8 * 1024 * 1024):
    row_bytes = 2 * wp * 2 * c * dtype_bytes
    th = max(1, budget // (4 * row_bytes))
    while hp % th:
        th -= 1
    return th


def _paired(x):
    """(N, H, W, C) -> (N, H, wp, 2C) row-major view (plus even-crop)."""
    n, h, w, c = x.shape
    he, we = (h // 2) * 2, (w // 2) * 2
    x = x[:, :he, :we, :]
    return x.reshape(n, he, we // 2, 2 * c)


def _forward(x):
    n, h, w, c = x.shape
    hp, wp = h // 2, w // 2
    xp = _paired(x)
    th = _pick_th(hp, wp, c, x.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, c=c),
        grid=(n, hp // th),
        in_specs=[pl.BlockSpec((1, 2 * th, wp, 2 * c), lambda ni, hi: (ni, hi, 0, 0))],
        out_specs=pl.BlockSpec((1, th, wp, c), lambda ni, hi: (ni, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp)


@jax.custom_vjp
def max_pool2x2_pallas(x):
    return _forward(x)


def _fwd_rule(x):
    y = _forward(x)
    return y, (x, y)


def _bwd_rule(res, g):
    x, y = res
    n, h, w, c = x.shape
    hp, wp = h // 2, w // 2
    he, we = hp * 2, wp * 2
    xp = _paired(x)
    th = _pick_th(hp, wp, c, g.dtype.itemsize)
    gxp = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c),
        grid=(n, hp // th),
        in_specs=[
            pl.BlockSpec((1, 2 * th, wp, 2 * c), lambda ni, hi: (ni, hi, 0, 0)),
            pl.BlockSpec((1, th, wp, c), lambda ni, hi: (ni, hi, 0, 0)),
            pl.BlockSpec((1, th, wp, c), lambda ni, hi: (ni, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * th, wp, 2 * c), lambda ni, hi: (ni, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, he, wp, 2 * c), g.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp, y, g)
    gx = gxp.reshape(n, he, we, c)
    if he != h or we != w:
        gx = jnp.pad(gx, ((0, 0), (0, h - he), (0, w - we), (0, 0)))
    return (gx,)


max_pool2x2_pallas.defvjp(_fwd_rule, _bwd_rule)
