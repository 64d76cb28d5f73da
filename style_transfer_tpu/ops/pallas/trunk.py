"""Fused Pallas early-trunk kernels: conv1_1 .. pool2 in VMEM.

Why: at print resolutions, XLA lowers the giant early-block convolutions
(C=64/128 at millions of pixels) to tiled loop-and-accumulate programs whose
bookkeeping — full-tensor layout copies, per-band reshapes, pad-add gradient
assembly — costs 2-4x the MXU work itself (PERF.md, "2896x2172 per-op
profile"; the round-2 banded-XLA trunk still spent ~110 ms/iter on data
formatting + copies). These kernels are the structural fix: a grid pass over
receptive-field-haloed image tiles computes conv1_1 -> relu -> conv1_2 ->
relu -> pool1 -> conv2_1 -> relu -> conv2_2 -> relu -> pool2 entirely in
VMEM, emitting only

* the pool2 "cut" activation (4x4-fold smaller than the image), from which
  the deep trunk — which XLA already compiles at near-peak — runs
  monolithically (same hybrid structure as ``ops/banded.py``), and
* the W2/Gram moment statistics (pixel sum + second raw moment) of the two
  early style taps, relu1_1 and relu2_1, accumulated across tiles in-kernel
  (reference semantics: ``style_transfer.py:162-173``).

The backward is one tile-local kernel (recompute in VMEM, no stored
activations): every cotangent a tile needs lives within a fixed halo, so
there is no cross-tile communication. Max-pool adjoints *upsample*, which
Mosaic cannot express as an element interleave (sublane/lane MERGES are
unsupported shape casts, probe-verified on v5e); instead the pooled
cotangent and max are nearest-upsampled via leading-dim stack+merge (legal)
with an outer<->sublane transpose for the column direction, and the
select-and-scatter "first max wins" routing becomes parity-masked shifted
compares at full resolution (in f32 — the target rejects bf16 vector
compares).

Conv formulation (no XLA conv emitter): each 3x3 conv is ONE matmul
``(pixels, 3*Cin) @ (3*Cin, 3*Cout)`` — rows pack the three row shifts
(ky), columns pack the three column taps (kx) — plus two shifted adds to
fold the kx partial products. conv1_1 (Cin=3, a degenerate case for conv
emitters) is a 27-column im2col matmul with the ImageNet normalization
folded into its weights and bias.

Semantics match the monolithic XLA trunk (``models/vgg.py``): replicate
padding for conv1_1 at true image edges, zero (SAME) padding for the other
convs, floor 2x2/2 max pooling with select-and-scatter (first-max) gradient
routing, bf16 trunk with f32 accumulation. ``tests/test_trunk_pallas.py``
asserts loss/grad equivalence against the monolithic trunk on CPU via the
Mosaic interpreter.
"""

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.vgg import IMAGENET_MEAN, IMAGENET_STD

__all__ = ["early_trunk_stats", "pack_trunk_params", "TILE", "CUT_LAYER"]

TILE = 64  # default owned image rows/cols per grid step (multiple of 16);
# larger tiles cut the halo-slab overlap tax ((T+2h)^2/T^2: 1.56x at 64,
# 1.27x at 128) at the cost of bigger VMEM working sets — overridable per
# call (StepConfig.pallas_tile).
CONV_IMPL = "concat"  # "concat": (A,B,3C) input lane-concat (one matmul);
# "ky3": three per-ky matmuls with output-row-shift accumulation — no input
# concat materialization (A/B candidate for the kernel's VPU-bound traffic).
POOL_BWD = "recompute"  # "recompute": backward re-derives max-pool routing
# with parity-masked shifted compares (_unpool_first_max); "stored": the
# forward also emits each window's first-max quadrant index (0..3) and the
# backward routes with one upsample+compare+multiply — ~half the unpool VPU
# ops for ~150 MB/iter of extra residual traffic at 6 Mpx.
HALO_F = 8  # receptive halo through pool2 (multiple of 4); the backward
# needs no more: a2/a4 arrive as stored residuals, so its recompute
# (conv1_1 + conv2_1) and cotangent chain stay within the same 8 px.
CUT_LAYER = 9  # torchvision index of pool2 (parity with ops/banded.py)

_VMEM_LIMIT = 110 * 1024 * 1024  # v5e has 128M physical VMEM


def _f32(x):
    return x.astype(jnp.float32)


def pack_trunk_params(params, dtype):
    """Pack conv1_1..conv2_2 weights for the shift-add matmul formulation.

    Returns a dict of arrays:
      w0 (27, 64) + b0 (1, 64): conv1_1 im2col weights with the ImageNet
        normalization folded in (rows ordered (ky, kx, ci));
      w1/w2/w3 (3*Cin, 3*Cout) + b1/b2/b3: conv1_2 / conv2_1 / conv2_2,
        rows (ky, ci), cols (kx, co);
      w0t/w1t/w2t/w3t: the flipped-transposed variants for the backward
        (conv-transpose is a SAME conv with kernel w[::-1, ::-1] and
        swapped channel axes). In every packed matrix each kx block is
        zero-padded to >= 128 output lanes for vreg-aligned slicing.
    """
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    w0 = _f32(params["conv0_kernel"]) / std[None, None, :, None]
    b0 = _f32(params["conv0_bias"]) - jnp.sum(
        _f32(params["conv0_kernel"]) * (mean / std)[None, None, :, None],
        axis=(0, 1, 2),
    )

    def cat(w):  # (3,3,ci,co) -> (3ci, 3*cp): rows (ky,ci), cols (kx,co)
        # Each kx block is zero-padded to 128 output lanes so the kx
        # partial-product slices in the combine step are vreg-aligned
        # (Mosaic rejects lane concats of operands at mismatched offsets,
        # and unaligned lane slices cost register shuffles).
        w = _f32(w)
        ci, co = w.shape[2], w.shape[3]
        cp = max(co, 128)
        w = w.transpose(0, 2, 1, 3)  # (ky, ci, kx, co)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cp - co)))
        return w.reshape(3 * ci, 3 * cp)

    def catT(w):  # packed transpose-conv kernel: flip taps, swap channels
        return cat(w[::-1, ::-1].transpose(0, 1, 3, 2))

    w0t = _f32(params["conv0_kernel"])[::-1, ::-1] / std[None, None, :, None]
    w0t = w0t.transpose(0, 1, 3, 2)  # (3,3,64,3)

    packed = {
        "w0": w0.reshape(27, -1),
        "b0": b0[None],
        "w1": cat(params["conv2_kernel"]),
        "b1": _f32(params["conv2_bias"])[None],
        "w2": cat(params["conv5_kernel"]),
        "b2": _f32(params["conv5_bias"])[None],
        "w3": cat(params["conv7_kernel"]),
        "b3": _f32(params["conv7_bias"])[None],
        "w0t": cat(w0t),  # (192, 384): kx blocks of co=3 padded to 128
        "w1t": catT(params["conv2_kernel"]),
        "w2t": catT(params["conv5_kernel"]),
        "w3t": catT(params["conv7_kernel"]),
    }
    return {
        k: v.astype(dtype) if k[0] == "w" else v for k, v in packed.items()
    }


# --------------------------------------------------------------------------
# In-kernel building blocks (pure value-level jnp; Mosaic manages VMEM).
# --------------------------------------------------------------------------


def _shift_rows(v, d):
    """v shifted so result[r] = v[r - d] (zero fill); d in {-1, 0, +1}."""
    if d == 0:
        return v
    z = jnp.zeros_like(v[:1])
    return (
        jnp.concatenate([z, v[:-1]], 0) if d > 0
        else jnp.concatenate([v[1:], z], 0)
    )


def _shift_cols(v, d):
    if d == 0:
        return v
    z = jnp.zeros_like(v[:, :1])
    return (
        jnp.concatenate([z, v[:, :-1]], 1) if d > 0
        else jnp.concatenate([v[:, 1:], z], 1)
    )


def _conv3x3(v, wcat, bias, co):
    """SAME 3x3 conv of (A, B, C) by packed (3C, 3*cp): rows (ky, ci), cols
    (kx, co) with cp = kx block width >= 128 and vreg-aligned. Returns the
    (A, B, co) pre-activation (edge columns/rows carry garbage one ring
    deep — callers track the valid margin).

    Two formulations (``CONV_IMPL``), identical values:
      * "concat": lane-concat the three row shifts into an (A, B, 3C) input
        and run ONE matmul;
      * "ky3": one matmul per ky block on the UNSHIFTED input, row-shifting
        the f32 partial products instead (a row shift commutes with the
        per-row matmul, and zero-filled rows map to zero partials). This
        never materializes the widened input — the lane concat is the
        kernel's main relayout traffic.
    Both fold kx with two shifted adds on the f32 partials. Partial products
    and the combine stay f32 (Mosaic requires a 32-bit matmul accumulator;
    a post-dot bf16 cast measured net-slower)."""
    a, b, c = v.shape
    cp = wcat.shape[1] // 3
    if CONV_IMPL == "ky3":
        vf = v.reshape(a * b, c)
        p = None
        for ky in range(3):
            pk = lax.dot_general(
                vf, wcat[ky * c:(ky + 1) * c],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(a, b, 3 * cp)
            pk = _shift_rows(pk, 1 - ky)  # out[y] += v[y + ky - 1] @ w[ky]
            p = pk if p is None else p + pk
    else:
        t = jnp.concatenate(
            [_shift_rows(v, 1), v, _shift_rows(v, -1)], axis=-1
        )  # (A,B,3C): block ky reads in[y+ky-1]
        p = lax.dot_general(
            t.reshape(a * b, 3 * c), wcat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(a, b, 3 * cp)
    out = p[..., cp:cp + co]
    out = out + _shift_cols(p[..., :co], 1)  # kx=0 tap: out[x] += P[x-1]
    out = out + _shift_cols(p[..., 2 * cp:2 * cp + co], -1)  # kx=2: P[x+1]
    if bias is not None:
        out = out + bias[0]
    return out


def _split4(v):
    """(2A, 2B, C) -> 2x2 nested quad streams q[dr][dc] of (A, B, C) with
    q[dr][dc][r, c] = v[2r + dr, 2c + dc].

    Strided slicing lowers to gathers Mosaic rejects, and sublane->lane
    merges are unsupported shape casts; rank-expanding SPLITS of the outer
    (row) and sublane (column) dims, however, are legal (probe-verified on
    v5e)."""
    a2, b2, c = v.shape
    vr = v.reshape(a2 // 2, 2, b2, c)
    q0 = vr[:, 0].reshape(a2 // 2, b2 // 2, 2, c)
    q1 = vr[:, 1].reshape(a2 // 2, b2 // 2, 2, c)
    return [[q0[:, :, 0], q0[:, :, 1]], [q1[:, :, 0], q1[:, :, 1]]]


def _pool2x2(v):
    q = _split4(v)
    return jnp.maximum(
        jnp.maximum(q[0][0], q[0][1]), jnp.maximum(q[1][0], q[1][1])
    )


def _pool2x2_idx(v, cdt):
    """2x2/2 max pool + the FIRST (row-major) max's quadrant index (0..3),
    as a small-integer-valued cdt tensor (bf16 represents 0..3 exactly).
    Compares in f32 (Mosaic rejects bf16 vector compares)."""
    q = _split4(v)
    m = jnp.maximum(
        jnp.maximum(q[0][0], q[0][1]), jnp.maximum(q[1][0], q[1][1])
    )
    mf = _f32(m)
    three = jnp.full(m.shape, 3.0, jnp.float32)
    idx = jnp.where(
        _f32(q[0][0]) >= mf, jnp.zeros_like(mf),
        jnp.where(_f32(q[0][1]) >= mf, jnp.ones_like(mf),
                  jnp.where(_f32(q[1][0]) >= mf, 2.0 * jnp.ones_like(mf),
                            three)),
    )
    return m, idx.astype(cdt)


def _unpool_stored(g, idx, act):
    """Adjoint of 2x2/2 max pooling from a stored quadrant index: upsample
    the pooled cotangent and index, keep positions whose window-local
    row-major position (2*(r%2) + c%2) equals the stored index, then apply
    the relu' mask of ``act`` (the pool's input)."""
    gu = _up2(g)
    iu = _f32(_up2(idx))
    a2_, b2_ = act.shape[:2]
    py = lax.broadcasted_iota(jnp.int32, (a2_, b2_, 1), 0) % 2
    px = lax.broadcasted_iota(jnp.int32, (a2_, b2_, 1), 1) % 2
    pos = (2 * py + px).astype(jnp.float32)
    take = (iu == pos) & (_f32(act) > 0.0)
    return jnp.where(take, gu, jnp.zeros_like(gu))


def _rep_rows(v):
    """Element-wise 2x row repeat: (A, B, C) -> (2A, B, C) via leading-dim
    stack+merge (legal in Mosaic; element-granular sublane/lane interleaves
    are not)."""
    return jnp.stack([v, v], 1).reshape(2 * v.shape[0], *v.shape[1:])


def _up2(v):
    """Nearest-neighbor 2x upsample of (A, B, C): columns first behind an
    outer<->sublane transpose (while the tensor is smallest), then rows by
    stack+merge (cheap leading-dim ops)."""
    t = v.transpose(1, 0, 2)
    v = _rep_rows(t).transpose(1, 0, 2)
    return _rep_rows(v)


def _unpool_first_max(g, v, m):
    """Adjoint of 2x2/2 max pooling with select-and-scatter semantics: the
    window's FIRST (row-major) max receives the cotangent. v is the pooled
    input (2A, 2B, C), m = pool(v) (A, B, C), g the pooled cotangent.

    Works entirely at full resolution: nearest-upsample m and g, mark
    within-window maxima with an f32 comparison (Mosaic rejects bf16 vector
    compares), and kill non-first winners with parity-masked shifted
    "earlier position also matched" terms.
    """
    one = jnp.ones((), jnp.float32)
    zero = jnp.zeros((), jnp.float32)
    a2_, b2_ = v.shape[:2]
    # The upsampled window max never needs a column interleave: with
    # q = row-pair max (still full width), the max over position x's window
    # is max(q[x], q[x -/+ 1]) picked by column parity.
    vr = v.reshape(a2_ // 2, 2, b2_, v.shape[2])
    q = jnp.maximum(vr[:, 0], vr[:, 1])
    pxh = lax.broadcasted_iota(jnp.int32, (a2_ // 2, b2_, 1), 1) % 2
    mu_half = jnp.maximum(
        q, jnp.where(pxh == 0, _shift_cols(q, -1), _shift_cols(q, 1)))
    mu = _rep_rows(mu_half)
    del m
    gu = _up2(g)
    eq = jnp.where(_f32(v) >= _f32(mu), one, zero)
    eq_l = _shift_cols(eq, 1)
    eq_u = _shift_rows(eq, 1)
    eq_ur = _shift_rows(_shift_cols(eq, -1), 1)
    eq_ul = _shift_rows(_shift_cols(eq, 1), 1)
    a2_, b2_ = v.shape[:2]
    py = lax.broadcasted_iota(jnp.int32, (a2_, b2_, 1), 0) % 2
    px = lax.broadcasted_iota(jnp.int32, (a2_, b2_, 1), 1) % 2
    pxf = jnp.where(px == 1, one, zero)
    pyf = jnp.where(py == 1, one, zero)
    # priors in window order (0,0)<(0,1)<(1,0)<(1,1):
    #  (0,1): L | (1,0): U, UR | (1,1): UL, U, L
    prior = jnp.maximum(
        pxf * eq_l,
        pyf * jnp.maximum(eq_u, jnp.where(px == 1, eq_ul, eq_ur)),
    )
    first = eq * (1.0 - prior)
    return (_f32(gu) * first).astype(g.dtype)


def _relu_mask(g, act):
    """g where act > 0 (the trunk's relu'), with the compare in f32."""
    return jnp.where(_f32(act) > 0.0, g, jnp.zeros_like(g))


class _TileMasks:
    """Per-tile, per-resolution keep masks, built ONCE and reused.

    Every individual mask site used to rebuild two (a, b, 1) iotas plus four
    compares — each processing 128x-lane-padded vregs — and the forward has
    five such sites per tile (the backward four more plus the moment
    ownership masks). Hoisting the iotas and predicates to one construction
    per resolution removes the dominant share of the kernel's vector work.
    """

    def __init__(self, a, r0, c0, hlim, wlim, halo, tile):
        ri = lax.broadcasted_iota(jnp.int32, (a, a, 1), 0)
        ci = lax.broadcasted_iota(jnp.int32, (a, a, 1), 1)
        gr = ri + r0
        gc = ci + c0
        self.img = (gr >= 0) & (gr < hlim) & (gc >= 0) & (gc < wlim)
        self.owned = ((ri >= halo) & (ri < halo + tile)
                      & (ci >= halo) & (ci < halo + tile))

    def mask_image(self, v):
        """Zero out-of-image positions — emulates zero (SAME) padding at
        true image edges and blanks the out-of-image part of edge tiles."""
        return jnp.where(self.img, v, jnp.zeros_like(v))

    def mask_owned(self, v):
        return jnp.where(self.owned, v, jnp.zeros_like(v))


def _replicate_ring(x, i, j, halo, H, W, T):
    """Build conv1_1's 1-px replicate ring at TRUE image edges on the
    (E, E, 3) input slab (global row of slab row r is i*T - halo + r).
    Rows first, then columns (matching jnp.pad 'edge' corner semantics)."""
    e = x.shape[0]
    ri = lax.broadcasted_iota(jnp.int32, (e, e, 1), 0)
    x = jnp.where((ri == halo - 1) & (i == 0), _shift_rows(x, -1), x)
    bot = H - i * T + halo  # slab row of global row H
    x = jnp.where(ri == bot, _shift_rows(x, 1), x)
    ci = lax.broadcasted_iota(jnp.int32, (e, e, 1), 1)
    x = jnp.where((ci == halo - 1) & (j == 0), _shift_cols(x, -1), x)
    rgt = W - j * T + halo
    x = jnp.where(ci == rgt, _shift_cols(x, 1), x)
    return x


def _shift_ax(v, d, axis):
    """v shifted by d along ``axis`` (zero fill), for channel-first planes."""
    if d == 0:
        return v
    idx = [slice(None)] * v.ndim
    zidx = [slice(None)] * v.ndim
    idx[axis] = slice(None, -1) if d > 0 else slice(1, None)
    zidx[axis] = slice(None, 1)
    z = jnp.zeros_like(v[tuple(zidx)])
    return (jnp.concatenate([z, v[tuple(idx)]], axis) if d > 0
            else jnp.concatenate([v[tuple(idx)], z], axis))


def _conv3x3_planes(v, wcat, co):
    """Like :func:`_conv3x3` but emits CHANNEL-FIRST (co, A, B) f32 planes
    (intended for tiny co, e.g. the conv1_1-transpose's 3 image channels):
    elementwise work on a channels-last (A, B, 3) value costs 42x its
    logical volume in Mosaic vregs (the 3-lane minor pads to 128), while
    width-1 lane selects stacked on a new outer axis are a cheap legal
    relayout and plane ops pad only A/B to the vreg tile."""
    a, b, c = v.shape
    cp = wcat.shape[1] // 3
    if CONV_IMPL == "ky3":
        vf = v.reshape(a * b, c)
        p = None
        for ky in range(3):
            pk = lax.dot_general(
                vf, wcat[ky * c:(ky + 1) * c],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(a, b, 3 * cp)
            pk = _shift_rows(pk, 1 - ky)
            p = pk if p is None else p + pk
    else:
        t = jnp.concatenate(
            [_shift_rows(v, 1), v, _shift_rows(v, -1)], axis=-1
        )
        p = lax.dot_general(
            t.reshape(a * b, 3 * c), wcat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(a, b, 3 * cp)
    planes = [
        p[..., cp + c_] + _shift_ax(p[..., c_], 1, 1)
        + _shift_ax(p[..., 2 * cp + c_], -1, 1)
        for c_ in range(co)
    ]
    return jnp.stack(planes, 0)


def _conv1_1(x, w0, b0):
    """conv1_1 on the (E, E, 3) slab: 27-column im2col matmul.
    Returns f32 (E, E, 64) (1-px edge ring garbage)."""
    e = x.shape[0]
    cols = []
    for ky in range(3):
        r = _shift_rows(x, 1 - ky)  # pixel y reads row y + ky - 1
        for kx in range(3):
            cols.append(_shift_cols(r, 1 - kx))
    x27 = jnp.concatenate(cols, axis=-1)  # (E,E,27), (ky,kx,ci)
    p = lax.dot_general(
        x27.reshape(e * e, 27), w0,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return p.reshape(e, e, -1) + b0[0]


def _tile_masks(i, j, halo, H, W, T):
    """(full-res, half-res) _TileMasks for tile (i, j)."""
    e = T + 2 * halo
    r0 = i * T - halo
    c0 = j * T - halo
    mf = _TileMasks(e, r0, c0, H, W, halo, T)
    mh = _TileMasks(e // 2, r0 // 2, c0 // 2, H // 2, W // 2,
                    halo // 2, T // 2)
    return mf, mh


def _forward_l0(x, refs, i, j, mf, halo, H, W, T, cdt):
    """Image slab -> (a1, a2): the full-resolution block."""
    x = _replicate_ring(x, i, j, halo, H, W, T)
    a1 = jnp.maximum(_conv1_1(x, refs["w0"][:], refs["b0"][:]), 0.0)
    a1 = mf.mask_image(a1.astype(cdt))
    a2 = jnp.maximum(_conv3x3(a1, refs["w1"][:], refs["b1"][:], 64), 0.0)
    a2 = mf.mask_image(a2.astype(cdt))
    return a1, a2


def _forward_tile(x, refs, i, j, mf, mh, halo, H, W, T, cdt,
                  store_idx=False):
    """Shared fwd recompute: image slab -> (a1, a2, p1, a3, a4, p2[, idxs]).
    All activations are post-relu, edge-masked, in compute dtype. With
    ``store_idx``, also returns the two pools' first-max quadrant indices."""
    a1, a2 = _forward_l0(x, refs, i, j, mf, halo, H, W, T, cdt)
    if store_idx:
        p1, idx1 = _pool2x2_idx(a2, cdt)
    else:
        p1 = _pool2x2(a2)
    p1 = mh.mask_image(p1)
    a3 = jnp.maximum(_conv3x3(p1, refs["w2"][:], refs["b2"][:], 128), 0.0)
    a3 = mh.mask_image(a3.astype(cdt))
    a4 = jnp.maximum(_conv3x3(a3, refs["w3"][:], refs["b3"][:], 128), 0.0)
    a4 = mh.mask_image(a4.astype(cdt))
    if store_idx:
        p2, idx2 = _pool2x2_idx(a4, cdt)
        return a1, a2, p1, a3, a4, p2, idx1, idx2
    p2 = _pool2x2(a4)
    return a1, a2, p1, a3, a4, p2


# --------------------------------------------------------------------------
# Forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(ximg, w0, b0, w1, b1, w2, b2, w3, b3,
                cut_ref, s1_ref, m1_ref, s6_ref, m6_ref, a2_ref, a4_ref,
                *idx_refs, H, W, cdt, T):
    halo = HALO_F
    e = T + 2 * halo
    i, j = pl.program_id(0), pl.program_id(1)
    k = i * pl.num_programs(1) + j

    x = ximg[0, 0]
    refs = {"w0": w0, "b0": b0, "w1": w1, "b1": b1, "w2": w2, "b2": b2,
            "w3": w3, "b3": b3}
    mf, mh = _tile_masks(i, j, halo, H, W, T)
    out = _forward_tile(x, refs, i, j, mf, mh, halo, H, W, T, cdt,
                        store_idx=bool(idx_refs))
    a1, a2, _, a3, a4, p2 = out[:6]

    # Cut activation: owned pool2 rows/cols (halo/4 = 2 deep in the buffer).
    q = halo // 4
    h2 = halo // 2
    cut_ref[0] = p2[q:q + T // 4, q:q + T // 4].astype(cdt)
    # Residuals for the backward: storing the two expensive-to-recompute
    # activations (conv1_2's and conv2_2's outputs) costs ~2x the image in
    # HBM traffic but removes ~60% of the backward's tile recompute.
    a2_ref[0] = a2[halo:halo + T, halo:halo + T]
    a4_ref[0] = a4[h2:h2 + T // 2, h2:h2 + T // 2]
    if idx_refs:  # stored pool routing (POOL_BWD='stored'): owned indices
        idx1, idx2 = out[6], out[7]
        idx_refs[0][0] = idx1[h2:h2 + T // 2, h2:h2 + T // 2]
        idx_refs[1][0] = idx2[q:q + T // 4, q:q + T // 4]

    # Moment statistics over the OWNED, in-image part of the taps. Masking
    # (not slicing) keeps the buffers tile-aligned; out-of-image positions
    # are already zero.
    v1 = mf.mask_owned(a1).reshape(e * e, -1)
    v3 = mh.mask_owned(a3).reshape((e // 2) * (e // 2), -1)
    s1 = jnp.sum(_f32(v1), axis=0, keepdims=True)
    s6 = jnp.sum(_f32(v3), axis=0, keepdims=True)
    m1 = lax.dot_general(v1, v1, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    m6 = lax.dot_general(v3, v3, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _():
        s1_ref[:] = s1
        m1_ref[:] = m1
        s6_ref[:] = s6
        m6_ref[:] = m6

    @pl.when(k > 0)
    def _():
        s1_ref[:] += s1
        m1_ref[:] += m1
        s6_ref[:] += s6
        m6_ref[:] += m6


# --------------------------------------------------------------------------
# Backward kernel (tile-local recompute, full-resolution cotangents)
# --------------------------------------------------------------------------


def _bwd_kernel(ximg, a2s, a4s, gcut, *rest,
                H, W, cdt, T):
    halo = HALO_F
    i, j = pl.program_id(0), pl.program_id(1)
    if POOL_BWD == "stored":
        i1s, i2s = rest[0], rest[1]
        rest = rest[2:]
    (w0, b0, w2, b2, w0t, w1t, w2t, w3t,
     gs1, gm1, gs6, gm6, dimg_ref) = rest

    x = ximg[0, 0]
    a2 = a2s[0, 0]
    a4 = a4s[0, 0]
    g_p2 = gcut[0, 0]
    mf, mh = _tile_masks(i, j, halo, H, W, T)

    # Recompute only the cheap activations; a2/a4 (the conv1_2 / conv2_2
    # outputs) are exact stored values, so their slabs carry no edge-ring
    # garbage and the backward halo shrinks to the forward's.
    x = _replicate_ring(x, i, j, halo, H, W, T)
    a1 = jnp.maximum(_conv1_1(x, w0[:], b0[:]), 0.0)
    a1 = mf.mask_image(a1.astype(cdt))
    p1 = _pool2x2(a2)
    a3 = jnp.maximum(_conv3x3(p1, w2[:], b2[:], 128), 0.0)
    a3 = mh.mask_image(a3.astype(cdt))

    # pool2 backward: route the cut cotangent to the first-max of each 2x2.
    if POOL_BWD == "stored":
        g4 = _unpool_stored(g_p2.astype(cdt), i2s[0, 0], a4)
    else:
        p2 = _pool2x2(a4)
        g4 = _unpool_first_max(g_p2.astype(cdt), a4, p2)
        g4 = _relu_mask(g4, a4)

    # conv2_2 transpose + relu2_1 moment cotangent injection.
    g3 = _conv3x3(g4, w3t[:], None, 128)
    inj6 = gs6[:][0] + lax.dot_general(
        a3.reshape(-1, a3.shape[-1]), gm6[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(a3.shape)
    g3 = g3 + mh.mask_image(inj6)
    g3 = _relu_mask(g3.astype(cdt), a3)

    # conv2_1 transpose -> pool1 backward -> conv1_2 transpose.
    g_p1 = _conv3x3(g3, w2t[:], None, 64).astype(cdt)
    if POOL_BWD == "stored":
        g2 = _unpool_stored(g_p1, i1s[0, 0], a2)
    else:
        g2 = _unpool_first_max(g_p1, a2, p1)
        g2 = _relu_mask(g2, a2)
    g1 = _conv3x3(g2, w1t[:], None, 64)
    inj1 = gs1[:][0] + lax.dot_general(
        a1.reshape(-1, a1.shape[-1]), gm1[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(a1.shape)
    g1 = g1 + mf.mask_image(inj1)
    g1 = _relu_mask(g1.astype(cdt), a1)

    # conv1_1 transpose down to the image (normalization folded into w0t),
    # emitted directly as channel-first (3, E, E) planes: every elementwise
    # op on a channels-last (E, E, 3) value would process 42x-padded vregs
    # (3-lane minor), while plane ops pad only the trailing dims.
    dxn = _conv3x3_planes(g1, w0t[:], 3)  # f32 (3, E, E)

    # Adjoint of the replicate ring (columns first — the forward built rows
    # first, then columns). Plane axes: rows = 1, columns = 2.
    ci = lax.broadcasted_iota(jnp.int32, dxn.shape, 2)
    dxn = dxn + jnp.where((ci == halo) & (j == 0), _shift_ax(dxn, 1, 2),
                          jnp.zeros_like(dxn))
    rgt = W - j * T + halo
    dxn = dxn + jnp.where(ci == rgt - 1, _shift_ax(dxn, -1, 2),
                          jnp.zeros_like(dxn))
    ri = lax.broadcasted_iota(jnp.int32, dxn.shape, 1)
    dxn = dxn + jnp.where((ri == halo) & (i == 0), _shift_ax(dxn, 1, 1),
                          jnp.zeros_like(dxn))
    bot = H - i * T + halo
    dxn = dxn + jnp.where(ri == bot - 1, _shift_ax(dxn, -1, 1),
                          jnp.zeros_like(dxn))

    # Owned crop; blocks span two column-tiles (the lane dim must be
    # 128-divisible), so each grid step fills its half under a parity
    # predicate (see _bwd_call).
    planes = dxn[:, halo:halo + T, halo:halo + T]

    @pl.when(j % 2 == 0)
    def _():
        dimg_ref[:, :, :T] = planes

    @pl.when(j % 2 == 1)
    def _():
        dimg_ref[:, :, T:] = planes


# --------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# --------------------------------------------------------------------------


def _cdiv(a, b):
    return -(-a // b)


def _tile_slabs(x, T, halo, nth, ntw):
    """(Hv, Wv, C) -> overlapping halo slabs (nth, ntw, E, E, C), slab
    (i, j) covering rows/cols [k*T, k*T + E) of the zero-padded array.
    Built in XLA with static slices (cheap strided copies); this sidesteps
    Mosaic's DMA slice-alignment rules entirely."""
    e = T + 2 * halo
    hp = nth * T + 2 * halo
    wp = ntw * T + 2 * halo
    hv, wv = x.shape[:2]
    x = jnp.pad(x, ((halo, hp - hv - halo), (halo, wp - wv - halo), (0, 0)))
    rows = jnp.stack([x[k * T:k * T + e] for k in range(nth)], 0)
    return jnp.stack([rows[:, :, k * T:k * T + e] for k in range(ntw)], 1)


_WKEYS = ("w0", "b0", "w1", "b1", "w2", "b2", "w3", "b3")


def _vspec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _slab_spec(e, c):
    return pl.BlockSpec((1, 1, e, e, c), lambda i, j: (i, j, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _image_slabs(image, packed, tile):
    """Haloed image slabs for both kernels — built once and passed through
    the VJP residuals: the Pallas boundary forces a tiled layout that pads
    the 3-channel minor dim 42x in HBM, so ONE such buffer must be shared
    by the forward and backward instead of being rebuilt in each."""
    H, W = image.shape[1:3]
    nth, ntw = _cdiv(H, tile), _cdiv(W, tile)
    return _tile_slabs(image[0].astype(packed["w1"].dtype), tile, HALO_F,
                       nth, ntw)


def _fwd_call(slabs, packed, static):
    H, W, interpret, TILE = static
    nth, ntw = _cdiv(H, TILE), _cdiv(W, TILE)
    e = TILE + 2 * HALO_F
    cdt = packed["w1"].dtype

    kernel = functools.partial(_fwd_kernel, H=H, W=W, cdt=cdt, T=TILE)
    out_specs = [
        pl.BlockSpec((1, TILE // 4, TILE // 4, 128),
                     lambda i, j: (0, i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 64), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 64), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE, TILE, 64), lambda i, j: (0, i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE // 2, TILE // 2, 128),
                     lambda i, j: (0, i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, H // 4, W // 4, 128), cdt),
        jax.ShapeDtypeStruct((1, 64), jnp.float32),
        jax.ShapeDtypeStruct((64, 64), jnp.float32),
        jax.ShapeDtypeStruct((1, 128), jnp.float32),
        jax.ShapeDtypeStruct((128, 128), jnp.float32),
        jax.ShapeDtypeStruct((1, H, W, 64), cdt),
        jax.ShapeDtypeStruct((1, H // 2, W // 2, 128), cdt),
    ]
    if POOL_BWD == "stored":
        out_specs += [
            pl.BlockSpec((1, TILE // 2, TILE // 2, 64),
                         lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE // 4, TILE // 4, 128),
                         lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((1, H // 2, W // 2, 64), cdt),
            jax.ShapeDtypeStruct((1, H // 4, W // 4, 128), cdt),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(nth, ntw),
        in_specs=[_slab_spec(e, 3)] + [_vspec()] * 8,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_params(),
        interpret=interpret,
    )(slabs, *[packed[k] for k in _WKEYS])
    return tuple(out)


def _bwd_call(xslabs, a2, a4, idx1, idx2, packed,
              g_cut, gs1, gm1, gs6, gm6, static):
    H, W, interpret, TILE = static
    nth, ntw = _cdiv(H, TILE), _cdiv(W, TILE)
    cdt = packed["w1"].dtype
    e = TILE + 2 * HALO_F
    a2slabs = _tile_slabs(a2[0], TILE, HALO_F, nth, ntw)
    a4slabs = _tile_slabs(a4[0], TILE // 2, HALO_F // 2, nth, ntw)
    gslabs = _tile_slabs(
        _f32(g_cut[0]).astype(cdt), TILE // 4, HALO_F // 4, nth, ntw)
    idx_ops, idx_specs = (), []
    if POOL_BWD == "stored":
        idx_ops = (
            _tile_slabs(idx1[0], TILE // 2, HALO_F // 2, nth, ntw),
            _tile_slabs(idx2[0], TILE // 4, HALO_F // 4, nth, ntw),
        )
        idx_specs = [_slab_spec(e // 2, 64), _slab_spec(e // 4, 128)]
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, W=W, cdt=cdt, T=TILE),
        grid=(nth, ntw),
        in_specs=[_slab_spec(e, 3), _slab_spec(e, 64),
                  _slab_spec(e // 2, 128), _slab_spec(e // 4, 128)]
        + idx_specs + [_vspec()] * 12,
        out_specs=pl.BlockSpec((3, TILE, 2 * TILE),
                               lambda i, j: (0, i, j // 2),
                               memory_space=pltpu.VMEM),
        # Channel-FIRST output: a (1, H, W, 3) Pallas output would get a
        # 42x-padded tiled layout in HBM (3-lane minor dim); channel-first
        # pads only the column dim to the lane tile.
        out_shape=jax.ShapeDtypeStruct(
            (3, nth * TILE, 2 * TILE * _cdiv(ntw, 2)), jnp.float32),
        compiler_params=_params(),
        interpret=interpret,
    )(
        xslabs, a2slabs, a4slabs, gslabs, *idx_ops,
        packed["w0"], packed["b0"], packed["w2"], packed["b2"],
        packed["w0t"], packed["w1t"], packed["w2t"], packed["w3t"],
        gs1, gm1, gs6, gm6,
    )
    return out[:, :H, :W].transpose(1, 2, 0)[None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _early_trunk(image, packed, static):
    return _fwd_call(_image_slabs(image, packed, static[3]), packed,
                     static)[:5]


def _early_trunk_fwd(image, packed, static):
    slabs = _image_slabs(image, packed, static[3])
    out = _fwd_call(slabs, packed, static)
    idx1, idx2 = (out[7], out[8]) if POOL_BWD == "stored" else (None, None)
    return out[:5], (slabs, out[5], out[6], idx1, idx2, packed)


def _early_trunk_bwd(static, res, cots):
    xslabs, a2, a4, idx1, idx2, packed = res
    g_cut, g_s1, g_m1, g_s6, g_m6 = cots
    gsym1 = _f32(g_m1) + _f32(g_m1).T
    gsym6 = _f32(g_m6) + _f32(g_m6).T
    dimg = _bwd_call(xslabs, a2, a4, idx1, idx2, packed, g_cut,
                     _f32(g_s1), gsym1, _f32(g_s6), gsym6, static)
    return dimg.astype(jnp.float32), jax.tree.map(jnp.zeros_like, packed)


_early_trunk.defvjp(_early_trunk_fwd, _early_trunk_bwd)


def early_trunk_stats(
    params,
    image,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    tile: int = TILE,
) -> Tuple[jnp.ndarray, Dict[int, Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Run the fused early trunk (conv1_1..pool2) over ``image``.

    Args:
      params: raw VGG param dict (``conv{i}_kernel`` / ``conv{i}_bias``).
      image: (1, H, W, 3) f32 image in [0, 1].
      compute_dtype: trunk dtype (bf16 on TPU; f32 for CPU-interpreter
        equivalence tests).
      interpret: run via the Mosaic interpreter (CPU testing).
      tile: owned image rows/cols per grid step (multiple of 16). Larger
        tiles shrink the halo-slab overlap tax but grow the VMEM working
        set quadratically.

    Returns:
      (cut, moments): ``cut`` is the pool2 activation (1, H//4, W//4, 128)
      in ``compute_dtype``; ``moments`` maps the early style taps
      {1: relu1_1, 6: relu2_1} to f32 ``(mean (1,C), srm (1,C,C))`` over the
      full image, matching ``ops/banded.banded_stats`` / ``losses.w2_moments``.
    """
    n, H, W, _ = image.shape
    if n != 1:
        raise ValueError("early_trunk_stats expects a single image")
    if tile % 16:
        raise ValueError("tile must be a multiple of 16")
    packed = pack_trunk_params(params, jnp.dtype(compute_dtype))
    cut, s1, m1, s6, m6 = _early_trunk(
        image, packed, (H, W, bool(interpret), int(tile)))
    np1 = jnp.asarray(H * W, jnp.float32)
    np2 = jnp.asarray((H // 2) * (W // 2), jnp.float32)
    moments = {
        1: (s1 / np1, (m1 / np1)[None]),
        6: (s6 / np2, (m6 / np2)[None]),
    }
    return cut, moments
