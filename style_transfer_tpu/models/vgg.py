"""TPU-native VGG-19 feature extractor.

Functional re-design of the reference's ``VGGFeatures`` module
(``/root/reference/style_transfer/style_transfer.py:20-90``): a pure function
over an explicit parameter pytree, NHWC layout (TPU's native conv layout),
bf16-on-MXU compute with f32 parameters, and no device-placement logic — the
reference's 2-GPU layer split (its only parallelism) is replaced wholesale by
SPMD spatial sharding in ``style_transfer_tpu.parallel``.

Behavioral parity:
* layer numbering = torchvision ``features`` indices, so the engine's default
  taps ([1,6,11,20,29] style / [22] content) mean the same thing (ref :316-317);
* ImageNet normalization of sRGB [0,1] inputs (ref :30-31);
* first conv uses replicate padding to reduce edge artifacts (ref :38-39);
* max/average/L2 pooling with activation rescale {1, 2, 0.78} (ref :21-22,41-46);
* the raw (pre-normalization) input rides along as ``feats[INPUT]`` (key -1,
  an int so the feats dict is a sortable pytree under jit/checkpoint) so the
  TV loss sees raw pixels (ref :84);
* minimum-input-size guard of 2^(#pools <= last tapped layer) (ref :61-69,80-83).
"""

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.pooling import POOLING_SCALES, pool2x2, replicate_pad2d
from .weights import CONV_CHANNELS, CONV_INDICES, POOL_INDICES

__all__ = [
    "INPUT",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "PAIRED_LAST",
    "min_input_size",
    "feature_shape",
    "normalize",
    "extract_features",
    "unpair_width",
]

# With ``paired_early``, layers 0..PAIRED_LAST emit width-paired
# (N, H, W/2, 2C) activations; pool1 (index 4) folds back to standard.
PAIRED_LAST = 3

# Key for the raw (pre-normalization) input image in the feats dict.
INPUT = -1

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

_CONV_SET = frozenset(CONV_INDICES)
_POOL_SET = frozenset(POOL_INDICES)
_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def min_input_size(layers: Sequence[int]) -> int:
    """2^(number of pooling layers at or before the last tapped layer)."""
    last = max(layers)
    size = 1
    for p in POOL_INDICES:
        if last < p:
            break
        size *= 2
    return size


def feature_shape(layer: int, h: int, w: int):
    """Static (h, w, c) of the activation tapped at ``layer`` for an h x w
    input — pools floor-halve, convs preserve. Used to pre-build abstract
    shapes for ahead-of-time compilation."""
    pools = sum(1 for p in POOL_INDICES if p <= layer)
    conv_idxs = [i for i in CONV_INDICES if i <= layer]
    c = CONV_CHANNELS[conv_idxs[-1]][1] if conv_idxs else 3
    for _ in range(pools):
        h, w = h // 2, w // 2
    return h, w, c


def normalize(x):
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def _conv_im2col(xp, kernel, bias, flatten: bool = True):
    """3x3 conv of an already 1-px-padded NHWC tensor as an explicit im2col
    matmul. Degenerate or layout-hostile cases for XLA:TPU's conv emitters
    run at matmul efficiency this way: conv1_1 (3 input channels measured
    at 0.8 TF/s with the conv emitter), and the first conv after the
    banded/Pallas pool2 cut, whose emitter output layout T(2,128) drags a
    10-40 ms relayout-and-refusion complex behind it at print sizes
    (PERF.md). ReLU fuses into the matmul epilogue.

    ``flatten=False`` contracts the rank-4 patch tensor directly
    (``dot_general`` over the patch dim, (n, h, w) stay free dims). Under
    SPMD spatial sharding the flattened form's (n*h*w, 9c) reshape merges
    the sharded H/W dims into the matmul rows, forcing GSPMD to all-gather
    the full patch matrix (measured: f32[1,128,512,27] gathered along W on
    a 4x2 mesh — 127 MB/step at print sizes); the rank-4 contraction keeps
    the spatial sharding intact.
    """
    n, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    cols = [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(3) for dx in range(3)]
    xcol = jnp.concatenate(cols, axis=-1)
    kcol = kernel.reshape(9 * c, -1).astype(xp.dtype)
    if flatten:
        y = jnp.dot(xcol.reshape(n * h * w, 9 * c), kcol).reshape(n, h, w, -1)
    else:
        y = lax.dot_general(xcol, kcol, (((3,), (0,)), ((), ())))
    return y + bias.astype(xp.dtype)


def _conv_input_grad(g, kernel):
    """d(VALID 3x3 conv)/d(padded input): full correlation of the cotangent
    with the spatially-flipped, IO-transposed kernel — the conv-transpose
    identity. One conv-emitter call, no patch-matrix cotangent."""
    kt = jnp.flip(kernel, (0, 1)).swapaxes(2, 3).astype(g.dtype)
    return lax.conv_general_dilated(
        g, kt, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        dimension_numbers=_DIMNUMS,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv_im2col_convgrad(xp, kernel, bias, flatten=True):
    """:func:`_conv_im2col` forward with a CONV-emitter backward.

    Autodiff of the im2col form materializes the 9C-channel patch-matrix
    cotangent and then runs the concatenate adjoint (a 9-way split) plus
    nine shifted pad-adds — at 2896x2172 the conv3_1 split fusion alone
    measured 2.8 ms/iter with a 1.2 ms pad-add behind it. The input
    gradient of a conv IS a conv (full correlation with the flipped
    transposed kernel), so the backward runs one emitter call on C-channel
    tensors instead. The forward stays im2col: the emitter pathology this
    formulation dodges (PERF.md r2 finding) is specific to the FORWARD
    shapes after a pooling cut; the backward conv has regular C-in/C-out
    shapes the emitter compiles at full throughput.
    """
    return _conv_im2col(xp, kernel, bias, flatten)


def _conv_im2col_convgrad_fwd(xp, kernel, bias, flatten):
    return _conv_im2col(xp, kernel, bias, flatten), (xp, kernel)


def _conv_im2col_convgrad_bwd(flatten, res, g):
    xp, kernel = res
    dxp = _conv_input_grad(g, kernel)
    # Honest parameter cotangents (the engine differentiates w.r.t. the
    # image only, so XLA dead-code-eliminates these in the hot step).
    n, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    dk = jnp.stack([
        jnp.stack([
            jnp.einsum(
                "nhwc,nhwo->co", xp[:, dy:dy + h, dx:dx + w, :], g,
                preferred_element_type=jnp.float32,
            )
            for dx in range(3)
        ])
        for dy in range(3)
    ]).astype(kernel.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(kernel.dtype)
    return dxp, dk, db


_conv_im2col_convgrad.defvjp(_conv_im2col_convgrad_fwd,
                             _conv_im2col_convgrad_bwd)


def _conv_im2col_paired(xp, kernel, bias):
    """conv1_1 of a 1-px-padded NHWC tensor, emitting the width-paired
    (N, H, W/2, 2*Co) layout directly: the im2col patch matrix is built IN
    pair space — the padded image reshapes (W+2, C) -> ((W+2)/2, 2C) once (a
    tiny C=3-minor relayout), and the 18 tap columns are then unit-stride
    slices at pair offsets {0, 1} — and multiplies a block-diagonal kernel.
    2x the matmul FLOPs (half the blocks are zero) but the K dim is tiny (27
    for C=3) and the output lands on a full 128-lane minor dim.

    Building the patch matrix from pixel space and pair-merging it afterwards
    was measured catastrophic: the (W, 9C) -> (W/2, 18C) lane-merge reshape
    made XLA flip the layout of the *image* and its whole elementwise
    neighborhood (EMA/Adam/TV went from ~0.1 to ~8 ms/iter at 512px).
    """
    n, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    half = w // 2
    xp2 = xp.reshape(n, hp, wp // 2, 2 * c)  # pair space; wp = w + 2 even
    # Padded pixel k = 2p + e; output pixel i taps k = i + dx, dx in {0,1,2}.
    # Even output 2j -> (p=j+0,e=0),(j+0,e=1),(j+1,e=0); odd 2j+1 shifts one.
    _TAPS = {0: ((0, 0), (0, 1), (1, 0)), 1: ((0, 1), (1, 0), (1, 1))}
    cols = [
        xp2[:, dy:dy + h, off:off + half, e * c:(e + 1) * c]
        for parity in (0, 1)
        for dy in range(3)
        for off, e in _TAPS[parity]
    ]
    xcol = jnp.concatenate(cols, axis=-1).reshape(n * h * half, 2 * 9 * c)
    k1 = kernel.reshape(9 * c, -1).astype(xp.dtype)
    co = k1.shape[-1]
    z = jnp.zeros_like(k1)
    kcol = jnp.concatenate(
        [jnp.concatenate([k1, z], axis=-1), jnp.concatenate([z, k1], axis=-1)],
        axis=0,
    )  # (18C, 2Co) block-diagonal
    y = jnp.dot(xcol, kcol)
    b2 = jnp.concatenate([bias, bias]).astype(xp.dtype)
    return y.reshape(n, h, half, 2 * co) + b2


def _pair_conv_kernel(k):
    """(3, 3, Ci, Co) HWIO kernel -> (3, 3, 2Ci, 2Co) operating on the
    width-paired layout. Output half o (pixel 2j+o) reads tap pixel
    2j+o+dx, which lives in pair j+(dj-1), half (o+dx) mod 2; solving
    dx = 2(dj-1) + ih - oh for dx in {-1,0,1} places six of the twelve
    64x64 blocks (2x FLOPs, but the conv runs C=128-class on the MXU at
    ~4x the C=64 emitter's throughput).
    """
    z = jnp.zeros_like(k[:, 0])  # (3, Ci, Co)

    def rows(a2a, b2a, a2b, b2b):
        return jnp.concatenate(
            [jnp.concatenate([a2a, a2b], axis=-1),
             jnp.concatenate([b2a, b2b], axis=-1)],
            axis=-2,
        )

    dj0 = rows(z, k[:, 0], z, z)            # b->a: dx=-1
    dj1 = rows(k[:, 1], k[:, 2], k[:, 0], k[:, 1])  # center taps
    dj2 = rows(z, z, k[:, 2], z)            # a->b: dx=+1
    return jnp.stack([dj0, dj1, dj2], axis=1)  # (3, 3, 2Ci, 2Co)


def _conv_paired(x, kernel, bias):
    """3x3 SAME conv in the width-paired layout (see _pair_conv_kernel).
    Zero SAME-padding in pair space reproduces standard SAME padding: the
    out-of-image half of an edge pair only ever multiplies a zero block.
    """
    kp = _pair_conv_kernel(kernel).astype(x.dtype)
    y = lax.conv_general_dilated(
        x, kp, window_strides=(1, 1), padding="SAME",
        dimension_numbers=_DIMNUMS,
    )
    b2 = jnp.concatenate([bias, bias]).astype(x.dtype)
    return y + b2


def _pool_max_from_paired(x):
    """2x2/2 max pool of a width-paired tensor -> standard (N, H/2, W/2, C).
    The W-pair max is an elementwise max of the channel halves; only the
    H-pair reduction needs a (2,1) reduce_window, so the select_and_scatter
    backward runs over half the volume of a standard 2x2 window. Routing
    the H-pair through ``first_max`` instead (select backward) was measured
    TWICE and loses at every canvas (r4: +13 ms at 2896x2172 with a
    recompute backward; r5 'first+p1': 512px 6.26 vs 5.91, giant 162.2 vs
    155.8 ms/iter) — the halved reduce_window stays."""
    c = x.shape[-1] // 2
    m = jnp.maximum(x[..., :c], x[..., c:])
    return lax.reduce_window(
        m, -jnp.inf, lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID"
    )


def unpair_width(x):
    """(N, H, W/2, 2C) width-paired -> standard (N, H, W, C) (relayout copy;
    only used when a raw early tap must leave the paired domain)."""
    n, h, wp, c2 = x.shape
    c = c2 // 2
    return x.reshape(n, h, wp, 2, c).reshape(n, h, wp * 2, c)


def _edge_mask(x, valid_rows, valid_cols, stride: int, pair_w: bool):
    """Zero feature rows/cols that lie beyond the TRUE image edge.

    Used by the SPMD shard-local trunk (parallel/shard_early.py): an edge
    shard's halo-extended slab physically extends past the image, and the
    monolithic computation's SAME zero-padding at the true edge is
    reproduced by keeping everything beyond it at zero after every conv
    (zeros to any depth are indistinguishable from the 1-row zero pad; relu
    and the grid-aligned pools preserve them). ``valid_rows``/``valid_cols``
    are (lo, hi) pairs in input-pixel coords of the slab — each side a
    traced scalar (a multiple of every pool stride) or None for no mask on
    that side. The select fuses into the producing conv's epilogue.
    """
    if valid_rows is None and valid_cols is None:
        return x
    mask = None

    def rng_mask(bounds, n, axis_len):
        lo, hi = bounds
        ar = jnp.arange(axis_len, dtype=jnp.int32)
        m = None
        if lo is not None:
            m = ar >= (jnp.asarray(lo, jnp.int32) // n)
        if hi is not None:
            m2 = ar < (jnp.asarray(hi, jnp.int32) // n)
            m = m2 if m is None else (m & m2)
        return m

    if valid_rows is not None:
        rm = rng_mask(valid_rows, stride, x.shape[1])
        if rm is not None:
            mask = rm[None, :, None, None]
    if valid_cols is not None:
        n = stride * (2 if pair_w else 1)
        cm = rng_mask(valid_cols, n, x.shape[2])
        if cm is not None:
            cm = cm[None, None, :, None]
            mask = cm if mask is None else (mask & cm)
    if mask is None:
        return x
    return jnp.where(mask, x, jnp.zeros((), x.dtype))


def _conv(x, kernel, bias, first: bool, im2col: bool = False,
          im2col_flatten: bool = True, im2col_grad: str = "patch"):
    if first:  # conv1_1: replicate padding (ref :38-39)
        # conv1_1 keeps the patch backward: the conv-grad form would emit a
        # 3-output-channel backward conv — the exact degenerate emitter
        # shape the im2col forward exists to dodge.
        return _conv_im2col(replicate_pad2d(x, 1), kernel, bias,
                            flatten=im2col_flatten)
    if im2col:
        fn = (_conv_im2col_convgrad if im2col_grad == "conv"
              else _conv_im2col)
        return fn(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))), kernel, bias,
            im2col_flatten)
    padding = "SAME"
    # No preferred_element_type here: the TPU MXU already accumulates bf16
    # convolutions in f32 internally, and a widened output dtype would break
    # the conv transpose (backward) rule under mixed precision.
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=_DIMNUMS,
    )
    return y + bias.astype(x.dtype)


def extract_features(
    params,
    image,
    layers: Sequence[int],
    pooling: str = "max",
    compute_dtype: Optional[jnp.dtype] = None,
    pool_impl: str = "xla",
    cast_layer: int = 0,
    start_layer: int = 0,
    im2col_layers: Sequence[int] = (),
    paired_early: bool = False,
    im2col_flatten: bool = True,
    im2col_grad: str = "patch",
    valid_rows=None,
    valid_cols=None,
    sharded: bool = False,
):
    """Run the VGG-19 trunk up to the last requested layer.

    Args:
      params: dict of ``conv{i}_kernel`` (HWIO) / ``conv{i}_bias`` arrays.
      image: NHWC float image in [0, 1] (sRGB).
      layers: torchvision feature indices to tap (sorted set semantics).
      pooling: 'max' | 'average' | 'l2'.
      compute_dtype: dtype for the conv trunk (e.g. ``jnp.bfloat16`` for MXU
        throughput). Parameters stay f32; accumulation is pinned to f32.
      cast_layer: first layer index run in ``compute_dtype``; layers before it
        run f32. On TPU the bf16 C=3 first conv hits a pathological
        T(2,128) layout (~0.8 TF/s measured) — ``cast_layer=1`` keeps
        conv1_1 in f32 where XLA handles the 3-channel input well.
      start_layer: resume the trunk mid-stack — ``image`` is then the
        activation *entering* ``start_layer`` (normalization, the INPUT tap
        and the min-size guard are skipped; used by the banded halo-slab
        path to continue from a materialized cut-point tensor).
      im2col_layers: conv layer indices to run as explicit im2col matmuls
        instead of ``lax.conv`` (see ``_conv_im2col``; conv1_1 always is).
      im2col_flatten: pass False when the image is spatially sharded over a
        mesh — the flattened (n*h*w, 9c) im2col form merges sharded dims
        and forces GSPMD to all-gather the patch matrix (see
        ``_conv_im2col``).
      valid_rows / valid_cols: optional (lo, hi) bounds (input-pixel coords,
        traced scalars or None per side) of the TRUE image region within a
        halo-extended shard slab; feature rows/cols outside are zeroed after
        every conv so the monolithic zero-SAME padding at the true edge is
        reproduced to any slab depth (see :func:`_edge_mask`; used by
        parallel/shard_early.py). Bounds must be multiples of every pool
        stride up to the last requested layer.
      paired_early: run layers 0..PAIRED_LAST in the width-paired
        (N, H, W/2, 2C) layout — conv1_1 emits pairs directly, conv1_2 runs
        as a (3,3,128,128) block conv at full MXU lane occupancy (the
        standard C=64 block was measured at 45 TF/s and its tensors tile
        half-empty, 2x HBM waste), and pool1 folds back to the standard
        layout with only an H-direction select_and_scatter. Taps at layers
        <= PAIRED_LAST are RETURNED PAIRED — consumers fold statistics
        (losses.w2_moments_paired) or call :func:`unpair_width`. Requires
        even W and ``start_layer == 0``; non-max pooling unpaires before
        pool1 (correct, one relayout copy).

    Returns:
      dict mapping ``INPUT`` (-1) -> the raw image and each tapped index -> its
      activation (in compute dtype; losses upcast to f32 internally).
    """
    layers = sorted(set(int(l) for l in layers))
    last = layers[-1]
    pool_scale = POOLING_SCALES[pooling]
    if start_layer > 0:
        feats = {}
        x = image
        if compute_dtype is not None and start_layer >= cast_layer:
            x = x.astype(compute_dtype)
    else:
        h, w = image.shape[1:3]
        mins = min_input_size(layers)
        if min(h, w) < mins:
            raise ValueError(
                f"Input is {h}x{w} but must be at least {mins}x{mins}")
        feats = {INPUT: image}
        x = normalize(image)
        if compute_dtype is not None and cast_layer == 0:
            x = x.astype(compute_dtype)

    if paired_early:
        if start_layer > 0:
            raise ValueError("paired_early requires start_layer == 0")
        if image.shape[2] % 2:
            raise ValueError("paired_early requires an even input width")

    masked = valid_rows is not None or valid_cols is not None
    if masked and start_layer > 0:
        raise ValueError("valid_rows/valid_cols require start_layer == 0")
    stride = 1

    wanted = set(layers)
    for i in range(start_layer, last + 1):
        if compute_dtype is not None and i == cast_layer and cast_layer > 0:
            x = x.astype(compute_dtype)
        if paired_early and i <= PAIRED_LAST + 1:
            if i == 0:
                # conv1_1 stays im2col: a direct lax.conv on the paired
                # (N, H, W/2, 6) image (never materializing the 54-ch patch
                # matrix) measured 200.0 vs 181.4 ms/iter at 2896x2172 —
                # XLA's small-C conv emitters lose to the patch matmul at
                # every scale (PERF.md r2 finding 3, r4 re-check).
                x = _conv_im2col_paired(
                    replicate_pad2d(x, 1), params["conv0_kernel"],
                    params["conv0_bias"])
            elif i in _CONV_SET:
                x = _conv_paired(
                    x, params[f"conv{i}_kernel"], params[f"conv{i}_bias"])
            elif i in _POOL_SET:  # pool1 folds back to the standard layout
                if pooling == "max":
                    x = _pool_max_from_paired(x)
                else:
                    x = pool2x2(unpair_width(x), pooling, "xla")
                    x = x * jnp.asarray(pool_scale, x.dtype)
                stride *= 2
            else:
                x = jnp.maximum(x, 0)
            if masked and i in _CONV_SET:
                x = _edge_mask(x, valid_rows, valid_cols, stride,
                               pair_w=i <= PAIRED_LAST)
            if i in wanted:
                feats[i] = x
            continue
        if i in _CONV_SET:
            x = _conv(x, params[f"conv{i}_kernel"], params[f"conv{i}_bias"],
                      i == 0, im2col=i in im2col_layers,
                      im2col_flatten=im2col_flatten, im2col_grad=im2col_grad)
            if masked:
                x = _edge_mask(x, valid_rows, valid_cols, stride, pair_w=False)
        elif i in _POOL_SET:
            impl = pool_impl
            if sharded and pooling == "max":
                # GSPMD path (spatially sharded activations): only the
                # reduce_window + select_and_scatter formulation partitions
                # with halo exchanges; 'first'/'paired' backwards use
                # strided slices + interior pads, which GSPMD lowers via
                # activation ALL-GATHERS (caught by the dryrun no-all-gather
                # assertion). The shard-local trunk (inside shard_map) still
                # runs the fast impls on its local slabs.
                impl = "xla"
            elif impl == "auto":
                # Per-pool choice from v5e measurements (PERF.md "maxpool
                # saga"): paired wins only the genuinely SMALL regime
                # (512x512 step: all-paired 6.48 vs all-first 7.12 ms/iter,
                # r4) — everywhere else 'first' (W-pair/H-pair first_max
                # decomposition, no select_and_scatter) wins: forcing
                # first on every standard pool took the 2896x2172 step
                # 166.2 -> 160.2 ms/iter, with the band-slab pool2s
                # (w_ = 543 > 512, c=64 — previously 'paired' via the old
                # c<=128 clause) the bulk of the gap. Decide on THIS
                # pool's input shape.
                h_, w_ = x.shape[1:3]
                impl = ("paired"
                        if h_ * w_ <= 750_000 and w_ <= 512 else "first")
            x = pool2x2(x, pooling, impl)
            stride *= 2
            if pooling != "max":
                # Swapping the pooling type changes activation scale; rescale
                # like the reference does (ref :41-46).
                x = x * jnp.asarray(pool_scale, x.dtype)
        else:
            x = jnp.maximum(x, 0)  # ReLU
        if i in wanted:
            feats[i] = x
    return feats


# Convenience partial for the bf16 MXU path.
extract_features_bf16 = partial(extract_features, compute_dtype=jnp.bfloat16)
