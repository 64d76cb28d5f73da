"""Banded (halo-slab) trunk evaluation for print-resolution images.

Why: at ~6 Mpx, XLA:TPU lowers the giant VGG convolutions to a tiled
loop-and-accumulate strategy whose bookkeeping (inner while loops, layout
copies, dynamic-update-slice) costs more than the MXU work itself (PERF.md,
"2896x2172 per-op profile"). The fix here exploits the structure of the
objective instead of fighting the tiler: every loss term the engine uses
decomposes over horizontal bands of the image —

* W2 / Gram style statistics are pixel sums (mean and second raw moment,
  reference ``style_transfer.py:162-173``) — bands accumulate;
* content MSE / ScaledMSE are pixel sums of pointwise errors — bands
  accumulate against the matching target rows;
* TV is elementwise on the raw image (computed unbanded — it is cheap).

So the loss runs the *normal* trunk once per band on a slab that extends a
receptive-field halo beyond the band, crops the contaminated margin, and
accumulates. Each slab conv is a mid-size tensor XLA compiles without
internal tiling. Correctness of the crop: zero/replicate padding at a slab
edge only perturbs outputs within the receptive-field radius of that edge;
owned rows sit exactly ``halo`` >= radius away, and slab edges that coincide
with true image edges reproduce the monolithic padding bit-for-bit.

Gradients flow through the band slices natively (the adjoint of a static
slice is pad-and-add), so ``jax.grad`` of the banded loss equals the
monolithic gradient up to float reassociation. ``tests/test_banded.py``
asserts both loss and grad equivalence.
"""

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.weights import CONV_INDICES, POOL_INDICES

__all__ = ["receptive_halo", "band_bounds", "pool_stride", "banded_stats"]

# Slab starts must align with the pooling grid of the deepest tap:
# 2^(#pools before layer 29) = 16.
_QUANTUM = 16


def pool_stride(layer: int) -> int:
    """Cumulative downsampling factor at ``layer`` (2^#pools before it)."""
    return 2 ** sum(1 for p in POOL_INDICES if p <= layer)


def receptive_halo(layers: Sequence[int]) -> int:
    """Receptive-field radius (input px) of the deepest tapped layer,
    rounded up to the pool-grid quantum.

    Standard size/jump recursion: each 3x3 conv grows the field by 2*jump,
    each 2x2/2 pool by jump (then doubles the jump).
    """
    last = max(layers)
    size, jump = 1, 1
    for i in range(last + 1):
        if i in CONV_INDICES:
            size += 2 * jump
        elif i in POOL_INDICES:
            size += jump
            jump *= 2
    radius = size // 2
    return -(-radius // _QUANTUM) * _QUANTUM


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


def banded_stats(
    features_fn,
    image,
    *,
    style_layers: Sequence[int],
    content_layers: Sequence[int],
    content_targets: Dict[int, jnp.ndarray],
    n_bands: int,
    halo: int,
):
    """Accumulate loss statistics over halo-slabs of ``image``.

    Args:
      features_fn: ``(image_slab) -> {layer: activation}`` — the trunk,
        already closed over params/pooling/dtype (and optionally wrapped in
        ``jax.checkpoint`` for O(slab) backward memory).
      image: (N, H, W, C) image.
      style_layers / content_layers: tapped torchvision indices.
      content_targets: {layer: (N, h_l, w_l, C_l)} full-image targets.
      n_bands: number of horizontal bands (>= 2 to be useful).
      halo: input-px halo, >= receptive_halo(all tapped layers), multiple
        of the pool quantum.

    Returns:
      (moments, content_acc) where moments[layer] = (mean (N,C), srm
      (N,C,C)) over the full image in f32, and content_acc[layer] =
      (sum_sq_err, sum_abs_err, n_elements) in f32.
    """
    h = image.shape[1]
    bounds = band_bounds(h, n_bands)
    sums = {l: None for l in style_layers}
    outers = {l: None for l in style_layers}
    content_sse = {l: None for l in content_layers}
    content_abs = {l: None for l in content_layers}
    content_cnt = {l: 0 for l in content_layers}

    def _acc(tot, x):
        return x if tot is None else tot + x

    for k in range(len(bounds) - 1):
        s, e = bounds[k], bounds[k + 1]
        s2, e2 = max(0, s - halo), min(h, e + halo)
        feats = features_fn(image[:, s2:e2])
        for layer in set(style_layers) | set(content_layers):
            p = pool_stride(layer)
            fs = (s - s2) // p
            owned = (h // p) - (s // p) if e == h else (e - s) // p
            v = feats[layer][:, fs:fs + owned]
            if layer in sums:
                vf = v.astype(jnp.float32)
                sums[layer] = _acc(sums[layer], jnp.sum(vf, axis=(1, 2)))
                n, bh, bw, c = v.shape
                mat = v.reshape(n, bh * bw, c)
                outers[layer] = _acc(outers[layer], jnp.einsum(
                    "npc,npd->ncd", mat, mat,
                    precision=jax.lax.Precision.HIGH,
                    preferred_element_type=jnp.float32,
                ))
            if layer in content_sse:
                gs = s // p
                tgt = content_targets[layer][:, gs:gs + owned]
                diff = v.astype(jnp.float32) - tgt.astype(jnp.float32)
                content_sse[layer] = _acc(content_sse[layer],
                                          jnp.sum(jnp.square(diff)))
                content_abs[layer] = _acc(content_abs[layer],
                                          jnp.sum(jnp.abs(diff)))
                content_cnt[layer] += diff.size

    w = image.shape[2]
    moments = {}
    for layer in style_layers:
        p = pool_stride(layer)
        npix = jnp.asarray((h // p) * (w // p), jnp.float32)
        moments[layer] = (sums[layer] / npix, outers[layer] / npix)
    content_acc = {
        l: (content_sse[l], content_abs[l], content_cnt[l])
        for l in content_layers
    }
    return moments, content_acc
