"""Banded (halo-slab) trunk evaluation for print-resolution images.

Why: at ~6 Mpx, XLA:TPU lowers the giant early-block convolutions to tiled
loop-and-accumulate programs whose bookkeeping (inner while loops, layout
copies, dynamic-update-slice) costs more than the MXU work itself (PERF.md,
"2896x2172 per-op profile"). The fix exploits the structure of the
objective instead of fighting the tiler: every loss term the engine uses
decomposes over horizontal bands of the image —

* W2 / Gram style statistics are pixel sums (mean and second raw moment,
  reference ``style_transfer.py:162-173``) — bands accumulate;
* content MSE / ScaledMSE are pixel sums of pointwise errors — bands
  accumulate against the matching target rows;
* TV is elementwise on the raw image (computed unbanded — it is cheap).

The evaluation is **hybrid**: only the early trunk (through ``cut_layer``,
default pool2 — where the giant tensors live) runs per-band, on a slab that
extends a small receptive-field halo beyond the band. Taps inside the
banded region accumulate their statistics per band; the cut-point
activation's owned rows are concatenated into a full tensor (4x smaller
than the image) from which the deep trunk — which XLA already compiles at
near-peak — runs monolithically. Full-trunk banding (cut past the last tap)
was measured first and LOSES: the 80 px full-depth halo costs 29-44%
recompute; the pool2 cut needs only 16 px.

Correctness of the crop: padding at a slab edge only perturbs outputs
within the receptive-field radius of that edge; owned rows sit >= ``halo``
away, and slab edges that coincide with true image edges reproduce the
monolithic padding bit-for-bit. Band starts align to the pooling grid, so
in-slab pooling windows match the monolithic ones exactly.

Gradients flow through the band slices natively (the adjoint of a static
slice is pad-and-add; the adjoint of the cut concatenation is a slice), so
``jax.grad`` of the banded loss equals the monolithic gradient up to float
reassociation. ``tests/test_banded.py`` asserts loss and grad equivalence.
"""

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.weights import CONV_INDICES, POOL_INDICES
from . import losses as L

__all__ = [
    "receptive_halo", "band_bounds", "pool_stride", "banded_stats",
    "banded_stats_scan", "banded_forward_cut", "DEFAULT_CUT",
]

# Slab starts must align with the pooling grid of the deepest banded layer;
# 16 covers any cut (the full trunk has 4 pools before the last tap).
_QUANTUM = 16

# Default cut: pool2 (torchvision features index 9). Everything at stride
# 1-2 — the giant tensors — is banded; stride >= 4 runs monolithic.
DEFAULT_CUT = 9


def pool_stride(layer: int) -> int:
    """Cumulative downsampling factor at ``layer``'s output."""
    return 2 ** sum(1 for p in POOL_INDICES if p <= layer)


def receptive_halo(layers: Sequence[int]) -> int:
    """Receptive-field radius (input px) of the deepest given layer,
    rounded up to that layer's OWN pool-grid stride.

    Standard size/jump recursion: each 3x3 conv grows the field by 2*jump,
    each 2x2/2 pool by jump (then doubles the jump).

    The quantum is ``pool_stride(last)``, not the global 16-px band-bound
    quantum: slab starts only need to align to the pooling grid of the
    deepest layer INSIDE the slab for in-slab pool windows to match the
    monolithic ones. For the default pool2 cut that is 4 px, so the exact
    radius 8 survives unrounded (band bounds stay 16-px multiples, so
    every offset the halo produces stays grid-exact — pair space included,
    8 being even). Measured v5e at 2896x2172 (18x2 paired grid): halo 8 =
    169.0 ms/iter vs 174.8 at the old rounded-to-16 halo (-3.4%), loss
    trajectories bit-identical over 50 iters (both halos are exact)."""
    last = max(layers)
    size, jump = 1, 1
    for i in range(last + 1):
        if i in CONV_INDICES:
            size += 2 * jump
        elif i in POOL_INDICES:
            size += jump
            jump *= 2
    radius = size // 2
    q = pool_stride(last)
    return -(-radius // q) * q


def band_bounds(h: int, n_bands: int) -> Tuple[int, ...]:
    """Split ``h`` rows into ``n_bands`` contiguous bands whose interior
    boundaries are multiples of the pool-grid quantum."""
    quanta = h // _QUANTUM
    if n_bands > quanta:
        n_bands = max(1, quanta)
    bounds = [0]
    for k in range(1, n_bands):
        b = (quanta * k // n_bands) * _QUANTUM
        if b > bounds[-1]:
            bounds.append(b)
    bounds.append(h)
    return tuple(bounds)


def _owned(h, s, e, p):
    """Feature rows of level-stride ``p`` owned by band [s, e) of an
    ``h``-row image: start index within a slab beginning at ``s2`` is
    ``(s - s2) // p`` (exact — slab starts are grid-aligned)."""
    return (h // p) - (s // p) if e == h else (e - s) // p


def banded_forward_cut(
    early_fn,
    image,
    *,
    n_bands: int,
    cut_layer: int = DEFAULT_CUT,
    halo: int = 0,
    axis: int = 1,
):
    """Re-assembled ``cut_layer`` activation from per-band halo slabs.

    Forward-only counterpart of :func:`banded_stats` for target capture
    (engine ``_features``): the giant early block runs per slab — dodging
    XLA's giant-tensor conv tiling — and only the 4x-smaller cut activation
    is concatenated; the caller runs the deep trunk monolithically from it.
    Identical to the monolithic activation up to float reassociation (same
    halo/crop argument as banded_stats; asserted in tests/test_banded.py).
    """
    if axis not in (1, 2):
        raise ValueError("axis must be 1 (rows) or 2 (columns)")
    ext = image.shape[axis]
    if halo <= 0:
        halo = receptive_halo([cut_layer])
    bounds = band_bounds(ext, n_bands)
    p = pool_stride(cut_layer)
    rows = []
    for k in range(len(bounds) - 1):
        s, e = bounds[k], bounds[k + 1]
        s2 = max(0, s - halo)
        e2 = min(ext, e + halo)
        slab = image[:, s2:e2] if axis == 1 else image[:, :, s2:e2]
        feats = early_fn(slab)
        fs = (s - s2) // p
        cnt = _owned(ext, s, e, p)
        v = feats[cut_layer]
        rows.append(v[:, fs:fs + cnt] if axis == 1 else v[:, :, fs:fs + cnt])
    return jnp.concatenate(rows, axis=axis) if len(rows) > 1 else rows[0]


def banded_stats_scan(
    early_fn,
    late_fn,
    image,
    *,
    style_layers: Sequence[int],
    n_bands: int,
    cut_layer: int = DEFAULT_CUT,
    halo: int = 0,
    paired_last: int = -1,
    n_bands_w: int = 0,
    content_targets: Dict[int, jnp.ndarray] = None,
    return_cut: bool = False,
):
    """:func:`banded_stats` with the uniform interior row bands rolled into
    one ``lax.scan`` — same values, ~N_bands-times smaller XLA program.

    Why: the unrolled banded step duplicates the whole early trunk per slab
    (18x2 = 36 copies at 2896x2172), compiling to a 62 MB executable whose
    device LOAD costs tens of seconds over a remote-attached backend
    (PERF.md r5 "program-load bill"). Interior row bands are shape-uniform
    by construction, so the early trunk compiles ONCE inside a scan body
    and only the two edge bands (whose slabs clamp at the true image
    edges, reproducing the monolithic padding bit-for-bit) stay unrolled.

    Band geometry differs slightly from :func:`banded_stats` (interior
    bands are exactly equal-size, remainder quanta go to the edge bands)
    but the crop/halo correctness argument is identical: owned rows sit
    ``halo`` away from interior slab edges, and interior slabs never clamp
    (the first band is at least one ``_QUANTUM`` >= halo tall). Statistics
    accumulate in the scan carry; the cut activation assembles by
    ``dynamic_update_slice`` into a preallocated buffer.

    Restrictions vs banded_stats: rows axis only, no window (SPMD) mode,
    no content taps at or below ``cut_layer`` (the default content layer
    22 is far above the pool2 cut). The column split (``n_bands_w``) stays
    unrolled INSIDE the body — both column slabs clamp at a true W edge.

    ``content_targets`` may only name layers ABOVE the cut (they are
    computed from the monolithic deep trunk). Returns ``(moments,
    content_acc)`` or ``(moments, {}, cut)`` — banded_stats' contract.
    """
    if paired_last >= cut_layer:
        raise ValueError("paired_last must be below cut_layer")
    if content_targets and any(l <= cut_layer for l in content_targets):
        raise ValueError("banded_stats_scan: content taps must be above "
                         "the cut (use banded_stats)")
    ext, ext2 = image.shape[1], image.shape[2]
    early_style = [l for l in style_layers if l <= cut_layer]
    if halo <= 0:
        halo = receptive_halo(set(early_style) | {cut_layer})
    quanta = ext // _QUANTUM
    n_bands = max(3, min(n_bands, quanta))
    # Uniform interior bands; the remainder quanta (and the sub-quantum
    # tail of ext) split between the two edge bands.
    n_int = n_bands - 2
    bq = quanta // n_bands
    first_q = (quanta - n_int * bq) // 2
    first = first_q * _QUANTUM
    bsz = bq * _QUANTUM
    grid2d = n_bands_w >= 2
    bounds2 = band_bounds(ext2, max(n_bands_w, 1)) if grid2d else (0, ext2)
    keep_cut = late_fn is not None or return_cut
    p_cut = pool_stride(cut_layer)

    def _pairspace(layer, off, cnt):
        if layer <= paired_last:
            return off // 2, cnt // 2
        return off, cnt

    def _slab_feats(slab, s, e, s2, traced):
        """Crop per-layer owned features of a slab spanning rows [s2, s2+
        slab_h) for a band owning [s, e); s2/s may be traced (interior)."""
        feats = early_fn(slab)
        out = {}
        for layer in sorted(set(early_style) | ({cut_layer} if keep_cut else set())):
            p = pool_stride(layer)
            if traced:
                fs = halo // p  # interior slabs: fixed halo offset
                cnt = bsz // p
                v = lax.dynamic_slice_in_dim(feats[layer], fs, cnt, axis=1)
            else:
                fs = (s - s2) // p
                cnt = _owned(ext, s, e, p)
                v = feats[layer][:, fs:fs + cnt]
            out[layer] = v
        return out

    def _cols(slab_row):
        """Column slabs of a row slab (static W slices)."""
        if not grid2d:
            yield slab_row, None
            return
        for m in range(len(bounds2) - 1):
            t, u = bounds2[m], bounds2[m + 1]
            t2, u2 = max(0, t - halo), min(ext2, u + halo)
            yield slab_row[:, :, t2:u2], (t, u, t2)

    def _crop_cols(layer, v, colspec):
        if colspec is None:
            return v
        t, u, t2 = colspec
        p = pool_stride(layer)
        ft, cnt2 = _pairspace(layer, (t - t2) // p, _owned(ext2, t, u, p))
        return v[:, :, ft:ft + cnt2]

    def _moments_of(layer, v):
        if layer <= paired_last:
            c = v.shape[-1] // 2
            halves = (v[..., :c], v[..., c:])
        else:
            halves = (v,)
        s = sum(jnp.sum(u.astype(jnp.float32), axis=(1, 2)) for u in halves)
        o = sum(L.srm_outer(u) for u in halves)
        return s, o

    def _band(slab_row, s, e, s2, traced):
        """One row band: returns ({layer: (sum, outer)}, cut_row)."""
        mom, cut_cols = {}, []
        for slab, colspec in _cols(slab_row):
            feats = _slab_feats(slab, s, e, s2, traced)
            for layer in early_style:
                v = _crop_cols(layer, feats[layer], colspec)
                sm, o = _moments_of(layer, v)
                if layer in mom:
                    mom[layer] = (mom[layer][0] + sm, mom[layer][1] + o)
                else:
                    mom[layer] = (sm, o)
            if keep_cut:
                cut_cols.append(_crop_cols(cut_layer, feats[cut_layer], colspec))
        cut_row = None
        if keep_cut:
            cut_row = (jnp.concatenate(cut_cols, axis=2)
                       if len(cut_cols) > 1 else cut_cols[0])
        return mom, cut_row

    # --- edge bands (unrolled; slabs clamp at the true image edges) -------
    last_s = first + n_int * bsz
    mom_first, cut_first = _band(
        image[:, 0:first + halo], 0, first, 0, traced=False)
    mom_last, cut_last = _band(
        image[:, last_s - halo:ext], last_s, ext, last_s - halo, traced=False)

    cut = None
    if keep_cut:
        n, _, _, _ = cut_first.shape
        w2, c2 = cut_first.shape[2], cut_first.shape[3]
        cut = jnp.zeros((n, ext // p_cut, w2, c2), cut_first.dtype)
        cut = lax.dynamic_update_slice_in_dim(cut, cut_first, 0, axis=1)
        cut = lax.dynamic_update_slice_in_dim(
            cut, cut_last, last_s // p_cut, axis=1)

    # --- interior bands: ONE compiled body under lax.scan -----------------
    def body(carry, k):
        mom_c, cut_c = carry
        s = first + k * bsz
        slab_row = lax.dynamic_slice_in_dim(
            image, s - halo, bsz + 2 * halo, axis=1)
        mom, cut_row = _band(slab_row, s, None, s - halo, traced=True)
        mom_c = {
            l: (mom_c[l][0] + mom[l][0], mom_c[l][1] + mom[l][1])
            for l in mom_c
        }
        if keep_cut:
            cut_c = lax.dynamic_update_slice_in_dim(
                cut_c, cut_row, first // p_cut + k * (bsz // p_cut), axis=1)
        return (mom_c, cut_c), None

    if n_int > 0:
        mom0 = {
            l: (jnp.zeros_like(mom_first[l][0]), jnp.zeros_like(mom_first[l][1]))
            for l in mom_first
        }
        (mom_int, cut), _ = lax.scan(
            body, (mom0, cut), jnp.arange(n_int), length=n_int)
    else:
        mom_int = {l: (jnp.zeros_like(s), jnp.zeros_like(o))
                   for l, (s, o) in mom_first.items()}

    sums = {l: mom_first[l][0] + mom_int[l][0] + mom_last[l][0]
            for l in mom_first}
    outers = {l: mom_first[l][1] + mom_int[l][1] + mom_last[l][1]
              for l in mom_first}

    moments = {}
    for layer in early_style:
        p = pool_stride(layer)
        npix = jnp.asarray((ext // p) * (ext2 // p), jnp.float32)
        moments[layer] = (sums[layer] / npix, outers[layer] / npix)

    if return_cut:
        return moments, {}, cut
    content_acc = {}
    if late_fn is not None:
        feats2 = late_fn(cut)
        for layer in style_layers:
            if layer > cut_layer:
                moments[layer] = L.w2_moments(feats2[layer])
        for layer, tgt in (content_targets or {}).items():
            diff = (feats2[layer].astype(jnp.float32)
                    - tgt.astype(jnp.float32))
            content_acc[layer] = (
                jnp.sum(jnp.square(diff)), jnp.sum(jnp.abs(diff)), diff.size
            )
    return moments, content_acc


def banded_stats(
    early_fn,
    late_fn,
    image,
    *,
    style_layers: Sequence[int],
    content_layers: Sequence[int],
    content_targets: Dict[int, jnp.ndarray],
    n_bands: int,
    cut_layer: int = DEFAULT_CUT,
    halo: int = 0,
    axis: int = 1,
    paired_last: int = -1,
    n_bands_w: int = 0,
    window=None,
    return_cut: bool = False,
):
    """Accumulate loss statistics over halo-slabs of ``image``.

    Args:
      early_fn: ``(slab) -> {layer: activation}`` — the trunk through
        ``cut_layer`` (must tap every style/content layer <= cut_layer and
        ``cut_layer`` itself), closed over params/pooling/dtype.
      late_fn: ``(cut_activation) -> {layer: activation}`` — the trunk from
        ``cut_layer + 1`` on (taps every layer > cut_layer), or None when no
        tap lies past the cut.
      image: (N, H, W, C) image.
      style_layers / content_layers: tapped torchvision indices.
      content_targets: {layer: (N, h_l, w_l, C_l)} full-image targets.
      n_bands: number of horizontal bands (>= 2 to be useful).
      cut_layer: last banded layer (its output is re-assembled; default
        pool2).
      halo: input-px slab halo; 0 => receptive_halo of the banded layers.
      axis: spatial axis to band — 1 (rows, default) or 2 (columns).
        Column banding keeps slab WIDTH small, which on TPU keeps the
        per-pool paired formulation applicable (w <= 1536) at giant
        widths where row slabs span the full image width.
      paired_last: when ``early_fn`` runs the width-paired early trunk
        (vgg ``paired_early``), the last layer index whose tap is paired
        (vgg.PAIRED_LAST); -1 = standard layout. Paired taps fold their
        moments per channel half; paired content taps unpair. Must be <
        ``cut_layer`` (the re-assembled cut activation stays standard).
      n_bands_w: >= 2 adds a second banding level along the OTHER spatial
        axis, producing a 2D grid of halo slabs (rows x columns when
        ``axis == 1``). Squarer slabs keep the paired pool/early
        formulations eligible (their w <= 1536 window) at giant widths
        where single-axis row slabs span the whole image.
      window: SPMD shard-window mode (parallel/shard_early.py). ``image``
        is then one shard's OWNED block physically extended by a fixed
        halo of neighbor rows/cols on every windowed axis (uniform shapes
        across shards), and band slabs slice the window instead of
        clamping at edges. A dict:
          ``halo``: (halo_axis, halo_ax2) physical window halos in px —
            0 means that axis is unwindowed (its edges are true edges);
            a nonzero value must equal the in-band crop ``halo``.
          ``valid_lo`` / ``valid_hi``: per-axis traced scalars, physical
            coords of the true-image range within the window (lo = halo
            on the first shard else 0; hi = phys_extent - halo on the
            last shard else phys_extent). Rows/cols outside are
            replicate-fill from the halo exchange; ``early_fn`` is then
            called as ``early_fn(slab, valid_rows, valid_cols)`` and must
            zero features beyond the true edge after every conv
            (vgg.extract_features ``valid_rows``/``valid_cols``).
          ``global_hw``: optional (H, W) FULL-image extents — moments are
            then normalized by global pixel counts, so each shard returns
            a partial mean/srm and a plain ``psum`` across shards yields
            the exact full-image moments.
        Early content layers are unsupported in window mode (their
        targets would need global-offset slicing).
      return_cut: return ``(moments, content_acc, cut)`` with the
        re-assembled OWNED cut activation instead of feeding ``late_fn``
        (the SPMD path runs the deep trunk outside the shard_map region,
        GSPMD-partitioned; deep-layer moments are then absent from
        ``moments`` — the caller computes them from the global cut).

    Note: batching the identical-size interior slabs into stacked
    early-trunk calls was built and measured NET SLOWER at every group
    size (6 Mpx @27 bands: one batch 259 ms/iter, groups of 2/3/6
    222/234/263, vs 206 unrolled) — the batched call re-enters the
    giant-tensor tiling regime per-band evaluation exists to escape.
    Removed under the dead-by-default standard; see PERF.md r3.

    Returns:
      (moments, content_acc): moments[layer] = (mean (N,C), srm (N,C,C))
      over the full image in f32; content_acc[layer] = (sum_sq_err,
      sum_abs_err, n_elements) in f32.
    """
    if axis not in (1, 2):
        raise ValueError("axis must be 1 (rows) or 2 (columns)")
    if paired_last >= cut_layer:
        raise ValueError("paired_last must be below cut_layer")
    ax2 = 3 - axis  # the secondary banding axis (2D grid when n_bands_w >= 2)
    early_style = [l for l in style_layers if l <= cut_layer]
    early_content = [l for l in content_layers if l <= cut_layer]
    if halo <= 0:
        halo = receptive_halo(set(early_style) | set(early_content)
                              | {cut_layer})

    wh1 = wh2 = 0
    valid1 = valid2 = None
    if window is not None:
        wh1, wh2 = window["halo"]
        if any(wh not in (0, halo) for wh in (wh1, wh2)):
            raise ValueError("window halos must be 0 or equal the crop halo")
        if early_content:
            raise ValueError(
                "early content layers are unsupported in window mode")
        valid1 = window["valid_lo"][0], window["valid_hi"][0]
        valid2 = window["valid_lo"][1], window["valid_hi"][1]

    # Owned (true-image) extents; in window mode the physical array is
    # bigger by the window halos.
    ext = image.shape[axis] - 2 * wh1
    ext2 = image.shape[ax2] - 2 * wh2
    h, w = ((ext, ext2) if axis == 1 else (ext2, ext))
    if window is not None and "global_hw" in window:
        h, w = window["global_hw"]
    bounds = band_bounds(ext, n_bands)
    grid2d = n_bands_w >= 2 or wh2 > 0
    bounds2 = (band_bounds(ext2, max(n_bands_w, 1)) if grid2d
               else (0, ext2))

    def _slab(x, a, b, axis_=None):
        ax = axis if axis_ is None else axis_
        return x[:, a:b] if ax == 1 else x[:, :, a:b]

    def _pairspace(layer, ax, off, cnt):
        """Width-paired features index their W axis in PAIR space (all
        offsets even — band bounds and halos are 16-px-quantum multiples)."""
        if layer <= paired_last and ax == 2:
            return off // 2, cnt // 2
        return off, cnt

    sums, outers = {}, {}
    content_sse, content_abs, content_cnt = {}, {}, {}

    def _acc(d, key, x):
        d[key] = x if key not in d else d[key] + x

    def _moment_update(layer, v):
        if layer <= paired_last:  # width-paired tap: fold channel halves
            c = v.shape[-1] // 2
            halves = (v[..., :c], v[..., c:])
        else:
            halves = (v,)
        for u in halves:
            _acc(sums, layer, jnp.sum(u.astype(jnp.float32), axis=(1, 2)))
            # Contract (h, w) directly — the (n, bh*bw, c) reshape
            # materializes a relayout copy of the slab tap (and its VJP one
            # of the cotangent); measured ~18 ms/iter across bands at 6 Mpx.
            # srm_outer: HIGH-precision forward, single-pass backward.
            _acc(outers, layer, L.srm_outer(u))

    def _content_update(layer, v, off0, off1):
        if layer <= paired_last:
            from ..models.vgg import unpair_width

            v = unpair_width(v)
        tgt = _slab(content_targets[layer], off0, off0 + v.shape[axis])
        if grid2d:
            tgt = _slab(tgt, off1, off1 + v.shape[ax2], ax2)
        diff = v.astype(jnp.float32) - tgt.astype(jnp.float32)
        _acc(content_sse, layer, jnp.sum(jnp.square(diff)))
        _acc(content_abs, layer, jnp.sum(jnp.abs(diff)))
        content_cnt[layer] = content_cnt.get(layer, 0) + diff.size

    all_early = sorted(set(early_style) | set(early_content) | {cut_layer})

    keep_cut = late_fn is not None or return_cut

    cut_rows = []
    for k in range(len(bounds) - 1):
        s, e = bounds[k], bounds[k + 1]
        # Physical slab coords: with a window halo on this axis the slab
        # never clamps (the window supplies real neighbor / replicate-fill
        # rows past the owned block); unwindowed axes clamp at true edges.
        if wh1:
            s2, e2 = s + wh1 - halo, e + wh1 + halo
        else:
            s2, e2 = max(0, s - halo), min(ext, e + halo)
        row = _slab(image, s2, e2)
        vb1 = (valid1[0] - s2, valid1[1] - s2) if wh1 else None
        cut_cols = []
        for m in range(len(bounds2) - 1):
            t, u = bounds2[m], bounds2[m + 1]
            if wh2:
                t2, u2 = t + wh2 - halo, u + wh2 + halo
            else:
                t2, u2 = max(0, t - halo), min(ext2, u + halo)
            vb2 = (valid2[0] - t2, valid2[1] - t2) if wh2 else None
            slab = _slab(row, t2, u2, ax2) if grid2d else row
            if window is not None:
                vr, vc = (vb1, vb2) if axis == 1 else (vb2, vb1)
                feats = early_fn(slab, vr, vc)
            else:
                feats = early_fn(slab)
            for layer in all_early:
                p = pool_stride(layer)
                fs, cnt = _pairspace(
                    layer, axis, (s + wh1 - s2) // p, _owned(ext, s, e, p))
                v = _slab(feats[layer], fs, fs + cnt)
                if grid2d:
                    ft, cnt2 = _pairspace(
                        layer, ax2, (t + wh2 - t2) // p, _owned(ext2, t, u, p))
                    v = _slab(v, ft, ft + cnt2, ax2)
                if layer in early_style:
                    _moment_update(layer, v)
                if layer in early_content:
                    _content_update(layer, v, s // p, t // p)
                if layer == cut_layer and keep_cut:
                    cut_cols.append(v)
        if keep_cut:
            cut_rows.append(
                jnp.concatenate(cut_cols, axis=ax2)
                if len(cut_cols) > 1 else cut_cols[0]
            )

    cut = None
    if keep_cut:
        cut = (jnp.concatenate(cut_rows, axis=axis)
               if len(cut_rows) > 1 else cut_rows[0])

    if late_fn is not None and not return_cut:
        feats2 = late_fn(cut)
        for layer in style_layers:
            if layer > cut_layer:
                _moment_update(layer, feats2[layer])
        for layer in content_layers:
            if layer > cut_layer:
                _content_update(layer, feats2[layer], 0, 0)

    moments = {}
    for layer in style_layers:
        if layer not in sums:  # deep tap deferred to the caller (return_cut)
            continue
        p = pool_stride(layer)
        npix = jnp.asarray((h // p) * (w // p), jnp.float32)
        moments[layer] = (sums[layer] / npix, outers[layer] / npix)
    content_acc = {
        l: (content_sse[l], content_abs[l], content_cnt[l])
        for l in content_layers
    }
    if return_cut:
        return moments, content_acc, cut
    return moments, content_acc
