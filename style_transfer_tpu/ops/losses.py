"""Pure loss functions for optimization-based style transfer.

Functional re-design of the reference's nn.Module losses
(``/root/reference/style_transfer/style_transfer.py:93-234``): every loss here
is a pure function of arrays, composable under ``jax.grad`` and ``jax.jit``,
with no hidden buffers. Feature maps are NHWC; statistics (means, Gram /
second-raw-moment matrices) live in channel space so they stay replicated
under spatial SPMD sharding while the activations themselves are sharded.

Losses implemented (reference parity):
* ``scaled_mse``   — MSE scaled so its gradient L1 norm is ~1 (ref :93-106).
* ``content_mse``  — plain MSE against fixed target features (ref :119-126).
* ``content_scaled`` — ScaledMSE content loss (ref :109-116; defined but
  unused by the reference engine — exposed here as a selectable mode).
* ``gram_matrix`` / ``gram_loss`` — Gram style loss, per-pixel-count
  normalization (ref :129-142). Selectable via ``style_loss='gram'``.
* ``w2_target`` / ``w2_loss`` — Wasserstein-2 style loss on feature
  distributions N(mean, cov) (ref :145-181). The target is kept as
  (mean, second raw moment) because those combine linearly across multiple
  style images (ref :162-168).
* ``tv_loss``      — L2 total variation, nine-point stencil on a
  replicate-padded image (ref :184-195).

All reductions accumulate in f32 regardless of the activation dtype, so the
VGG trunk can run in bf16 on the MXU without degrading the objective.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pooling import replicate_pad2d
from .sqrtm import sqrtm_eig, sqrtm_ns_lyap, trace_sqrtm_ns

__all__ = [
    "scaled_mse",
    "content_mse",
    "content_scaled",
    "gram_matrix",
    "gram_loss",
    "W2Target",
    "w2_moments",
    "w2_moments_paired",
    "w2_target",
    "w2_loss",
    "tv_loss",
]


def _f32(x):
    return x.astype(jnp.float32)


def scaled_mse(x, target, eps: float = 1e-8):
    """MSE scaled such that its gradient L1 norm is approximately 1."""
    diff = _f32(x) - _f32(target)
    return jnp.sum(jnp.square(diff)) / (jnp.sum(jnp.abs(diff)) + eps)


def content_mse(x, target):
    """Plain MSE content loss (the one the reference engine uses, ref :429)."""
    diff = _f32(x) - _f32(target)
    return jnp.mean(jnp.square(diff))


def content_scaled(x, target, eps: float = 1e-8):
    """ScaledMSE content loss (reference ContentLoss, ref :109-116)."""
    return scaled_mse(x, target, eps)


@jax.custom_vjp
def srm_outer(u):
    """``einsum('nhwc,nhwd->ncd', u, u)`` — the second-raw-moment outer
    product — with a single-pass-precision backward.

    The FORWARD must run ``Precision.HIGH`` (3-pass bf16): the moment feeds
    the covariance whose Newton-Schulz square root diverges under TPU's
    default single-pass-bf16 f32 matmuls (PERF.md finding #1). The BACKWARD
    does not: the cotangent only flows into the image gradient, whose every
    other segment (conv transposes, pool backwards) is already plain bf16 —
    a 3-pass gradient einsum buys nothing but MXU time (measured ~1/3 of
    the 10.9 ms/iter moment-einsum cost at 6 Mpx).
    """
    return jnp.einsum(
        "nhwc,nhwd->ncd", u, u,
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32,
    )


def _srm_outer_fwd(u):
    return srm_outer(u), u


def _srm_outer_bwd(u, g):
    # d/du sum(g * (u u^T)) = (g + g^T) u, applied per pixel.
    gsym = (g + jnp.swapaxes(g, -2, -1)).astype(u.dtype)
    return (jnp.einsum("ncd,nhwd->nhwc", gsym, u),)


srm_outer.defvjp(_srm_outer_fwd, _srm_outer_bwd)


def gram_matrix(feats):
    """Gram matrix of NHWC features, normalized by pixel count.

    Matches the reference's nonstandard ``mat @ mat.T / (H*W)`` normalization
    (ref :137-139). Returns (N, C, C) in f32.
    """
    n, h, w, c = feats.shape
    # Direct (h, w) contraction — see w2_moments for why no reshape.
    return srm_outer(feats) / jnp.asarray(h * w, jnp.float32)


def gram_loss(feats, target_gram, eps: float = 1e-8):
    return scaled_mse(gram_matrix(feats), target_gram, eps)


class W2Target(NamedTuple):
    """Per-layer W2 style target: N(mean, cov) plus its precomputed sqrt."""

    mean: jnp.ndarray  # (N, C)
    cov: jnp.ndarray  # (N, C, C), already + eps*I
    cov_sqrt: jnp.ndarray  # (N, C, C)


def w2_moments(feats):
    """Mean and second raw moment of NHWC features.

    These — unlike the covariance — combine linearly across style images
    (ref :162-168), which is how --style-weights blending works.
    """
    n, h, w, c = feats.shape
    mean = jnp.mean(_f32(feats), axis=(1, 2))  # (N, C)
    # Contract (h, w) directly — no (n, h*w, c) reshape: on TPU that reshape
    # materializes a relayout copy of the full-resolution tap (and its VJP
    # another one of the cotangent), ~18 ms/iter at 6 Mpx (PERF.md r2).
    srm = srm_outer(feats) / jnp.asarray(h * w, jnp.float32)
    return mean, srm


def w2_moments_paired(feats):
    """`w2_moments` of a width-paired (N, H, W/2, 2C) tensor (vgg.py
    ``paired_early``): the channel halves are the even/odd pixels of the
    same C channels, so the fold is two half-size direct-contraction
    einsums summed — identical values to unpairing first, with no
    relayout copy of the full-resolution tap.
    """
    n, h, wp, c2 = feats.shape
    c = c2 // 2
    a, b = feats[..., :c], feats[..., c:]
    npix = jnp.asarray(h * wp * 2, jnp.float32)
    mean = (jnp.sum(_f32(a), axis=(1, 2)) + jnp.sum(_f32(b), axis=(1, 2))) / npix
    srm = (srm_outer(a) + srm_outer(b)) / npix
    return mean, srm


def _srm_to_cov(mean, srm):
    return srm - jnp.einsum("nc,nd->ncd", mean, mean)


def _eye_like(x):
    return jnp.broadcast_to(jnp.eye(x.shape[-1], dtype=x.dtype), x.shape)


def _trace(m):
    """Batched trace as a masked sum.

    ``jnp.diagonal``'s reverse-mode transpose is a scatter-add, which on TPU
    materializes the cotangent through a scatter fusion plus layout copies
    (~0.8 ms/iter at 512px). ``sum(m * I)`` has a broadcast-multiply
    transpose instead.
    """
    return jnp.sum(m * _eye_like(m), axis=(-2, -1))


def w2_target(mean, srm, eps: float = 1e-4, sqrtm_iters: int = 12) -> W2Target:
    """Finalize a blended (mean, srm) pair into a W2Target (ref :152-160).

    The target square root uses the eigendecomposition (|eigenvalue|
    semantics, like the reference's ``sqrtm_eig``): blends with *negative*
    ``--style-weights`` can make the blended covariance indefinite, where
    Newton-Schulz diverges to NaN. Targets are computed once per scale, so
    the eigh cost is irrelevant; the per-iteration sqrtm stays NS because
    its input ``C_t^1/2 C C_t^1/2`` is PSD by construction. ``sqrtm_iters``
    is kept for API stability (used by the in-loop path)."""
    del sqrtm_iters
    cov = _srm_to_cov(mean, srm) + _eye_like(srm) * eps
    return W2Target(mean=mean, cov=cov, cov_sqrt=sqrtm_eig(cov))


def w2_loss(feats, target: W2Target, eps: float = 1e-4, sqrtm_iters: int = 12):
    """Wasserstein-2 distance between feature stats and the target Gaussian.

    W2(N(m1,C1), N(m2,C2))^2 = |m1-m2|^2 + tr(C1 + C2 - 2 (C2^1/2 C1 C2^1/2)^1/2),
    with the reference's mean-instead-of-sum reductions (ref :175-181).
    """
    mean, srm = w2_moments(feats)
    cov = _srm_to_cov(mean, srm) + _eye_like(srm) * eps
    mean_diff = jnp.mean(jnp.square(mean - target.mean))
    hi = jax.lax.Precision.HIGH
    inner = jnp.matmul(
        target.cov_sqrt,
        jnp.matmul(cov, target.cov_sqrt, precision=hi,
                   preferred_element_type=jnp.float32),
        precision=hi,
        preferred_element_type=jnp.float32,
    )
    sqrt_term = sqrtm_ns_lyap(inner, sqrtm_iters)
    cov_diff = _trace(target.cov + cov - 2.0 * sqrt_term) / cov.shape[-1]
    return mean_diff + jnp.mean(cov_diff)


def w2_losses_batched(means, covs, target: W2Target, sqrtm_iters: int = 12,
                      sqrtm_fn=None, trace_sqrtm_fn=None):
    """Per-element W2 losses for a stacked group of layers with equal C.

    Args: means (G, C); covs (G, C, C) already +eps*I; target fields stacked
    along G. Batching the group means the Newton-Schulz loops run as one
    batched matmul chain on the MXU instead of G sequential ones.
    Returns (G,) losses.

    With ``trace_sqrtm_fn`` (default in the fused step) the sqrt term is
    computed as a trace directly, whose analytic VJP is a scalar-matrix
    product (ops.sqrtm.trace_sqrtm_ns) — same value and gradient as the
    Lyapunov-solver path, minus its ~4-matmuls-per-NS-iteration backward
    chain. ``sqrtm_fn`` selects the full-matrix implementation for the
    reference-flavor Lyapunov path.
    """
    hi = jax.lax.Precision.HIGH
    mean_diff = jnp.mean(jnp.square(means - target.mean), axis=-1)
    inner = jnp.matmul(
        target.cov_sqrt,
        jnp.matmul(covs, target.cov_sqrt, precision=hi,
                   preferred_element_type=jnp.float32),
        precision=hi,
        preferred_element_type=jnp.float32,
    )
    if trace_sqrtm_fn is not None:
        tr_sqrt = trace_sqrtm_fn(inner, sqrtm_iters)
        cov_diff = (_trace(target.cov + covs) - 2.0 * tr_sqrt) / covs.shape[-1]
    else:
        sqrt_term = (sqrtm_fn or sqrtm_ns_lyap)(inner, sqrtm_iters)
        cov_diff = _trace(target.cov + covs - 2.0 * sqrt_term) / covs.shape[-1]
    return mean_diff + cov_diff


def moments_to_cov(mean, srm, eps: float = 1e-4):
    """(mean, srm) -> covariance + eps*I (shared by loss and target paths)."""
    cov = _srm_to_cov(mean, srm)
    return cov + _eye_like(cov) * eps


def tv_loss(image):
    """L2 total variation, nine-point stencil (ref :184-195), NHWC input.

    Axis-aligned neighbor diffs weighted 1/3, diagonal diffs 1/12, total x2.
    """
    x = replicate_pad2d(_f32(image), 1)
    c = x[:, 1:-1, 1:-1, :]
    d1 = jnp.mean(jnp.square(x[:, 1:-1, 2:, :] - c)) / 3.0
    d2 = jnp.mean(jnp.square(x[:, 2:, 1:-1, :] - c)) / 3.0
    d3 = jnp.mean(jnp.square(x[:, 1:, 1:, :] - x[:, :-1, :-1, :])) / 12.0
    d4 = jnp.mean(jnp.square(x[:, 1:, :-1, :] - x[:, :-1, 1:, :])) / 12.0
    return 2.0 * (d1 + d2 + d3 + d4)
