"""Pallas TPU kernels for the Newton-Schulz matrix square root.

Why: the fused step runs NS forward + Lyapunov backward chains every
iteration (5 style layers x 12 NS iterations). As XLA ops, each iteration is
3-4 small C x C matmuls with HBM round-trips between them. These kernels
keep the iteration state (y, z — a couple of MB even at C=512) resident in
VMEM for the whole chain: one HBM read of the input, 12 fori_loop iterations
of MXU matmuls on VMEM operands, one HBM write of the result.

Numerics match ``ops.sqrtm``: f32 with full-precision MXU passes (NS
diverges under single-pass bf16 on ill-conditioned input), Frobenius
normalization, and the same tie to the Lyapunov-solver backward.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sqrtm_ns_pallas", "sqrtm_ns_lyap_pallas", "trace_sqrtm_ns_pallas"]


def _dot(a, b):
    # Mosaic only lowers DEFAULT (single-pass bf16, under which NS diverges)
    # and HIGHEST (6-pass). Emulate Precision.HIGH — the 3-pass bf16x3
    # decomposition XLA uses, ~f32 product accuracy at half HIGHEST's cost:
    # a = a_hi + a_lo (bf16 head/tail), ab ~= a_hi b_hi + a_hi b_lo + a_lo b_hi.
    def split(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    a_hi, a_lo = split(a)
    b_hi, b_lo = split(b)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _add_diag(x, v):
    """x + v*I without materializing an identity buffer (iota compare fuses
    into the elementwise add)."""
    n = x.shape[-1]
    r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(r == c, x + v, x)


def _ns_fwd_kernel(a_ref, y_ref, *, num_iters):
    a = a_ref[0].astype(jnp.float32)
    n = a.shape[-1]
    norm = jnp.sqrt(jnp.sum(a * a))
    y0 = a / norm
    z0 = _add_diag(jnp.zeros((n, n), jnp.float32), 1.0)

    def body(_, yz):
        y, z = yz
        t = _add_diag(_dot(z, y) * -0.5, 1.5)
        return _dot(y, t), _dot(t, z)

    y, _ = lax.fori_loop(0, num_iters, body, (y0, z0))
    y_ref[0] = y * jnp.sqrt(norm)


def _ns_fwd_yz_kernel(a_ref, y_ref, z_ref, *, num_iters):
    """Coupled NS emitting both Y -> A^{1/2} and Z -> A^{-1/2}."""
    a = a_ref[0].astype(jnp.float32)
    n = a.shape[-1]
    norm = jnp.sqrt(jnp.sum(a * a))
    y0 = a / norm
    z0 = _add_diag(jnp.zeros((n, n), jnp.float32), 1.0)

    def body(_, yz):
        y, z = yz
        t = _add_diag(_dot(z, y) * -0.5, 1.5)
        return _dot(y, t), _dot(t, z)

    y, z = lax.fori_loop(0, num_iters, body, (y0, z0))
    sn = jnp.sqrt(norm)
    y_ref[0] = y * sn
    z_ref[0] = z / sn


def _lyap_bwd_kernel(z_ref, g_ref, q_ref, *, num_iters):
    z = z_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(z * z))
    a0 = z / norm
    q0 = g / norm

    def body(_, aq):
        a, q = aq
        at = a.T
        eye_aa = _add_diag(_dot(a, a) * -1.0, 3.0)
        q_new = (_dot(q, eye_aa) - _dot(at, _dot(at, q) - _dot(q, a))) * 0.5
        a_new = _dot(a, eye_aa) * 0.5
        return a_new, q_new

    _, q = lax.fori_loop(0, num_iters, body, (a0, q0))
    q_ref[0] = q * 0.5


def _batched(a):
    """Normalize to (G, C, C); returns (arr, had_batch)."""
    if a.ndim == 2:
        return a[None], False
    if a.ndim == 3:
        return a, True
    raise ValueError(f"expected (C,C) or (G,C,C), got {a.shape}")


def sqrtm_ns_pallas(a, num_iters: int = 12):
    """NS square root; whole iteration chain in one Pallas kernel."""
    ab, had_batch = _batched(a)
    g, c, _ = ab.shape
    out = pl.pallas_call(
        functools.partial(_ns_fwd_kernel, num_iters=num_iters),
        grid=(g,),
        in_specs=[pl.BlockSpec((1, c, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, c, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,  # v5e has 128M physical VMEM
        ),
    )(ab)
    return out if had_batch else out[0]


def _lyap_pallas(z, gbar, num_iters):
    zb, had_batch = _batched(z)
    gb, _ = _batched(gbar)
    g, c, _ = zb.shape
    out = pl.pallas_call(
        functools.partial(_lyap_bwd_kernel, num_iters=num_iters),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, c, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, c, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(zb, gb)
    return out if had_batch else out[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def sqrtm_ns_lyap_pallas(a, num_iters: int = 12, num_iters_backward: int = None):
    """Pallas NS sqrt with the memory-light Lyapunov-iteration VJP."""
    return sqrtm_ns_pallas(a, num_iters)


def _fwd(a, num_iters, num_iters_backward):
    z = sqrtm_ns_pallas(a, num_iters)
    return z, z


def _bwd(num_iters, num_iters_backward, z, g):
    iters = num_iters if num_iters_backward is None else num_iters_backward
    return (_lyap_pallas(z, g, iters),)


sqrtm_ns_lyap_pallas.defvjp(_fwd, _bwd)


def _sqrtm_ns_yz_pallas(a, num_iters):
    ab, had_batch = _batched(a)
    g, c, _ = ab.shape
    spec = pl.BlockSpec((1, c, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    y, z = pl.pallas_call(
        functools.partial(_ns_fwd_yz_kernel, num_iters=num_iters),
        grid=(g,),
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((g, c, c), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(ab)
    if not had_batch:
        y, z = y[0], z[0]
    return y, z


def _batch_trace(y):
    n = y.shape[-1]
    r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.sum(jnp.where(r == c, y, 0.0), axis=(-2, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def trace_sqrtm_ns_pallas(a, num_iters: int = 12):
    """``trace(sqrtm(A))`` with the analytic A^{-1/2}/2 VJP (see
    ops.sqrtm.trace_sqrtm_ns); the VMEM-resident chain emits Z alongside Y
    so the backward is a scalar-matrix product — no Lyapunov kernel."""
    y, _ = _sqrtm_ns_yz_pallas(a, num_iters)
    return _batch_trace(y)


def _trace_fwd(a, num_iters):
    y, zinv = _sqrtm_ns_yz_pallas(a, num_iters)
    return _batch_trace(y), zinv


def _trace_bwd(num_iters, zinv, g):
    return (0.5 * g[..., None, None] * zinv,)


trace_sqrtm_ns_pallas.defvjp(_trace_fwd, _trace_bwd)
