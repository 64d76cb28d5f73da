"""Spatial ops for the VGG trunk: pooling variants and replicate padding.

Capability parity with the reference's pooling configuration
(``/root/reference/style_transfer/style_transfer.py:21-22,41-46``): ``max``,
``average`` and ``l2`` (LPPool2d with p=2, which *sums* over the window before
the root) 2x2/stride-2 pooling, each with the empirical activation-rescale
factor the reference applies when swapping away from max pooling
(max: 1.0, average: 2.0, l2: 0.78).

All ops are NHWC and map onto ``lax.reduce_window``, which XLA lowers to
vectorized TPU window reductions and which GSPMD knows how to partition
spatially (halo exchange) when H/W are sharded.
"""

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["POOLING_SCALES", "pool2x2", "max_pool2x2", "max_pool2x2_first",
           "max_pool2x2_paired", "first_max", "replicate_pad2d", "safe_sqrt"]

# Reference style_transfer.py:22 — activation rescale per pooling mode.
POOLING_SCALES = {"max": 1.0, "average": 2.0, "l2": 0.78}


@jax.custom_jvp
def safe_sqrt(x):
    """sqrt with a bounded gradient at 0.

    L2 pooling takes sqrt of a sum of squares; at an all-zero window (common
    after ReLU) the true derivative is unbounded. PyTorch's LPPool backward
    produces 0 there; we match that by clamping the denominator.
    """
    return jnp.sqrt(x)


@safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.sqrt(x)
    denom = jnp.where(y > 0, 2.0 * y, jnp.inf)
    return y, dx / denom


def _maxpool_fwd_raw(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


@jax.custom_vjp
def first_max(x0, x1):
    """Elementwise max whose gradient routes ENTIRELY to ``x0`` on ties.

    This is torch ``max_pool2d``'s tie rule (gradient to the first max in
    window iteration order) expressed as a pure elementwise op, so a 2x2/2
    max pool decomposed into disjoint pair reductions (W pairs, then H
    pairs — that order reproduces row-major-first overall) gets an exact
    select_and_scatter-free backward: routing selects fuse, while XLA's own
    s&s lowering was measured at ~6.4 ms/step across band slabs plus
    ~3.0 ms on pool3 at 2896x2172 (PERF.md round 4). ``jnp.maximum``'s
    builtin VJP splits ties 50/50, which both diverges from the reference
    and emits two compares; this emits one.
    """
    return jnp.maximum(x0, x1)


def _first_max_fwd(x0, x1):
    take0 = x0 >= x1
    return jnp.where(take0, x0, x1), take0


def _first_max_bwd(take0, g):
    z = jnp.zeros((), g.dtype)
    return jnp.where(take0, g, z), jnp.where(take0, z, g)


first_max.defvjp(_first_max_fwd, _first_max_bwd)


def _h2_first(x):
    """(n, 2h, w, c) -> (n, h, w, c) max over H pairs, first-row-wins ties.

    The (2h) -> (h, 2) split is a free row-major reshape; the two slices
    have plain zero-pad adjoints that XLA fuses into one interleave write.
    """
    n, h, w, c = x.shape
    v = x.reshape(n, h // 2, 2, w, c)
    return first_max(v[:, :, 0], v[:, :, 1])


def _w2_first(x):
    """(n, h, 2w, c) -> (n, h, w, c) max over W pairs, first-col-wins ties.

    The (2w, c) -> (w, 2c) merge is a free row-major reshape putting W
    pairs on adjacent lane blocks; channel half 0 is the even (first)
    column of each pair."""
    n, h, w, c = x.shape
    v = x.reshape(n, h, w // 2, 2 * c)
    return first_max(v[..., :c], v[..., c:])


def max_pool2x2_first(x):
    """2x2/2 max pooling with a select_and_scatter-free, torch-exact
    backward: W-pair ``first_max`` then H-pair ``first_max`` reproduces
    row-major first-max tie routing (the exact semantics of both XLA's
    GE-select s&s and torch ``max_pool2d_with_indices``).

    Measured winner on the standard (non-width-paired) pools at giant
    scale (2896x2172 step: 'first' on every standard pool −8.0 ms/iter vs
    the s&s baseline, PERF.md r4). Two r4 variants of the same idea LOST
    and were dropped: this formulation applied to the width-paired trunk's
    pool1 (+4.8 ms — the pre-pool reshape forces whole-slab relayouts of
    the conv outputs feeding it), and a reduce_window-forward variant with
    a routing backward recomputed from the saved input via strided slices
    + interior-pad interleaves (giant 181.4 ms — the strided-slice/pad
    assembly costs more than the s&s it replaces).
    """
    n, h, w, c = x.shape
    hp, wp = h // 2, w // 2
    x = x[:, : hp * 2, : wp * 2, :]
    return _h2_first(_w2_first(x))


def max_pool2x2(x):
    """2x2/2 max pooling (XLA reduce_window; select-and-scatter backward).

    Note on the backward: select-and-scatter costs ~2.3 ms/step at 512px on
    a v5e. See ``max_pool2x2_paired`` / ``max_pool2x2_first`` (used on TPU
    where the per-pool 'auto' windows apply) for the surviving
    alternatives; PERF.md's "maxpool saga" has the measurement history,
    including the dropped Pallas, hpair, and routed-backward variants.
    """
    return _maxpool_fwd_raw(x)


def max_pool2x2_paired(x):
    """Max pooling via H-pair max (major-dim strided slice) + W-pair max
    (a row-major (W,C)->(W/2,2C) merge puts W pairs on adjacent lanes).

    Pure XLA ops with vanilla autodiff: the backward is elementwise selects
    and the reshape adjoints — no select_and_scatter. Tie gradients split
    50/50 per max (PyTorch picks the first winner; differs only on exact
    ties such as post-ReLU zeros). Wins the small-tensor regime (512px
    step: all-paired -9% vs all-xla); a first-max tie-exact backward for
    this impl was measured slower (r4) and reverted."""
    n, h, w, c = x.shape
    hp, wp = h // 2, w // 2
    x = x[:, : hp * 2, : wp * 2, :]
    m = jnp.maximum(x[:, 0::2], x[:, 1::2])  # (n, hp, 2*wp, c)
    v = m.reshape(n, hp, wp, 2 * c)
    return jnp.maximum(v[..., :c], v[..., c:])


def pool2x2(x, mode: str, impl: str = "xla"):
    """2x2 stride-2 pooling over NHWC, floor semantics on odd dims.

    ``l2`` follows ``nn.LPPool2d(2, 2)``: root of the *sum* (not mean) of
    squares over the window. ``impl`` selects the max-pool formulation
    ('xla' reduce_window, 'paired', or 'first'; extract_features resolves
    'auto' per-pool). Alternatives built, measured, and dropped: a fused
    Pallas max-pool (its (H,W,C)->(H,W/2,2C) boundary relayout cost more
    than the select_and_scatter it saved), an 'hpair' H-strided-max +
    width-only reduce_window (the strided-slice backward's scatter-add
    loses at every size: 512px 10.1 vs 8.4 ms/iter, 2896px 248 vs 191),
    and an s&s-forward + routed-recompute-backward 'first' variant (giant
    181.4 vs 168.0 ms/iter). See PERF.md "maxpool saga".
    """
    if mode == "max":
        if impl == "first":
            return max_pool2x2_first(x)
        if impl == "paired":
            return max_pool2x2_paired(x)
        if impl != "xla":
            raise ValueError(f"unknown maxpool impl {impl!r}")
        return max_pool2x2(x)
    if mode == "average":
        s = lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return s * jnp.asarray(0.25, dtype=x.dtype)
    if mode == "l2":
        s = lax.reduce_window(
            jnp.square(x), 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        return safe_sqrt(s)
    raise ValueError(f"unknown pooling mode {mode!r}")


def replicate_pad2d(x, pad: int = 1):
    """Edge-replicate padding on the spatial dims of an NHWC tensor."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
