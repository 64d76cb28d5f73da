"""The fused optimization step: one jitted program per scale.

Where the reference runs forward / backward / Adam / clamp / EMA as separate
eager PyTorch calls per iteration
(``/root/reference/style_transfer/style_transfer.py:472-497``), here the whole
iteration is a single pure function rolled under ``lax.scan`` for a chunk of
iterations, compiled once per image shape. XLA fuses the losses, the Adam
update, the box clamp, and the EMA update into the conv backward epilogue;
gradients are taken *only* with respect to the image, so the compiler never
materializes weight gradients at all.

TPU specifics:
* the VGG trunk runs in bf16 on the MXU (f32 accumulation) by default on TPU;
  the image, optimizer state, losses and sqrtm stay f32;
* optional rematerialization of the trunk for print-resolution scales
  (memory ~ O(tapped activations) instead of O(all activations));
* with a multi-chip mesh, the image carries a spatial sharding constraint and
  GSPMD partitions every conv/pool with halo exchanges over ICI.
"""

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .models.vgg import INPUT, PAIRED_LAST, extract_features, unpair_width
from .ops import losses as L
from .parallel.mesh import constrain_image
from .utils.ema import EMAState, ema_update

__all__ = [
    "StepConfig",
    "AdamState",
    "LoopState",
    "LBFGSState",
    "make_adam_runner",
    "make_lbfgs_runner",
    "make_lbfgs_zoom_runner",
]


@dataclass(frozen=True)
class StepConfig:
    """Static (hashable) per-scale configuration baked into the compiled step."""

    content_layers: Tuple[int, ...] = (22,)
    style_layers: Tuple[int, ...] = (1, 6, 11, 20, 29)
    content_weights: Tuple[float, ...] = (0.015,)
    style_layer_weights: Tuple[float, ...] = (
        256 / 341, 64 / 341, 16 / 341, 4 / 341, 1 / 341,
    )
    tv_weight: float = 2.0
    style_loss: str = "w2"  # 'w2' | 'gram'
    content_loss: str = "mse"  # 'mse' | 'scaled' (ref defines both, :109-126)
    pooling: str = "max"
    compute_dtype: Optional[str] = "bfloat16"  # None => f32 trunk
    step_size: float = 0.02
    beta1: float = 0.9
    beta2: float = 0.99
    adam_eps: float = 1e-8
    avg_decay: float = 0.99
    w2_eps: float = 1e-4
    sqrtm_iters: int = 12
    sqrtm_impl: str = "xla"  # 'xla' | 'pallas' (fused VMEM-resident NS chain)
    # W2 sqrt-term gradient: 'trace' computes tr(sqrtm(M)) with the analytic
    # A^{-1/2}/2 VJP (free from the coupled NS iteration's Z output — same
    # gradient the Lyapunov solve converges to, no backward matmul chain);
    # 'lyap' is the reference-flavor iterative Lyapunov backward.
    w2_grad: str = "trace"
    maxpool_impl: str = "xla"  # 'xla' | 'paired' | 'auto' (per-pool choice)
    remat: bool = False
    cast_layer: int = 0  # first trunk layer run in compute_dtype (see vgg.py)
    # Banded (halo-slab) trunk evaluation for print-resolution scales: the
    # loss decomposes over horizontal bands, so the giant early-block
    # tensors run per receptive-field-haloed slab while the deep trunk runs
    # monolithically from the re-assembled cut activation (ops/banded.py).
    # 0/1 = monolithic; >= 2 = number of bands. Single-mesh only (the
    # sharded path splits tensors across chips instead).
    n_bands: int = 0
    band_cut: int = 9  # last banded layer (9 = pool2); > last tap = full trunk
    band_halo: int = 0  # 0 => receptive_halo of the banded layers
    # Banded spatial axis: 0/1 = rows (default), 2 = columns. Column
    # banding was measured NET SLOWER on v5e at standard aspects (2896x2172
    # @12 bands: 270 vs 207 ms/iter rows; the narrow-wide slab shape starves
    # the conv emitters even though paired pools then apply) — it exists for
    # extreme-aspect (panorama) inputs where row slabs would span a giant W.
    band_axis: int = 0
    # >= 2 adds a second banding level along the other spatial axis (a 2D
    # halo-slab grid): squarer slabs keep the paired pool/early trunk
    # formulations eligible at giant widths (ops/banded.py).
    n_bands_w: int = 0
    # Roll the uniform interior row bands into one lax.scan body
    # (ops/banded.banded_stats_scan): same values, ~2x smaller compiled
    # program (2896x2172 @18x2: 63 -> 28-30 MB) at +21-24% execution time
    # (155.8 -> 188-193 ms/iter, r5 A/B) — opt-in, for cases where cold
    # compile/load time dominates (one-shot giant runs over a slow remote
    # attach). Row banding without early content taps only; silently
    # falls back to unrolled otherwise.
    band_scan: bool = False
    # Conv layers to run as explicit im2col matmuls (vgg._conv_im2col):
    # sidesteps XLA's conv-emitter layout pathologies, e.g. conv3_1 (10)
    # right after the pool2 cut at print sizes.
    im2col_layers: Tuple[int, ...] = ()
    # Backward formulation for im2col convs: 'patch' = plain autodiff
    # (materializes the 9C patch-matrix cotangent + split/pad-add adjoint);
    # 'conv' = conv-transpose identity, one conv-emitter call
    # (vgg._conv_im2col_convgrad). The engine's auto_size_knobs resolves
    # 'conv' on TPU (512px -12%, 2896x2172 -1.5% measured r4).
    im2col_grad: str = "patch"
    # Run conv1_1..relu1_2 in the width-paired (N, H, W/2, 2C) layout
    # (vgg.extract_features ``paired_early``): full 128-lane tiles for the
    # C=64 block, halved select_and_scatter at pool1. Early style taps are
    # folded via losses.w2_moments_paired; early content taps unpair.
    # Requires even image width.
    paired_early: bool = False
    # SPMD composition of the single-chip tricks (parallel/shard_early.py):
    # with a mesh, run the early trunk shard-locally under shard_map —
    # n_bands / n_bands_w / paired_early are then interpreted PER SHARD
    # (resolved for the shard block size) — with one explicit halo exchange
    # per sharded axis; the deep trunk stays GSPMD-partitioned from the
    # re-assembled cut. Requires shard-divisible dims (engine gates via
    # parallel.shard_early.shardable) and no content tap <= band_cut.
    shard_bands: bool = False

    @property
    def all_layers(self) -> Tuple[int, ...]:
        return tuple(sorted(set(self.content_layers) | set(self.style_layers)))

    @property
    def dtype(self):
        return None if self.compute_dtype is None else jnp.dtype(self.compute_dtype)


class AdamState(NamedTuple):
    mu: jnp.ndarray
    nu: jnp.ndarray
    count: jnp.ndarray  # i32 scalar


class LoopState(NamedTuple):
    image: jnp.ndarray  # NHWC f32 in [0, 1]
    opt: Any  # AdamState or optax state
    ema: EMAState


def build_loss_fn(cfg: StepConfig, mesh=None):
    """Returns ``loss(image, params, consts) -> scalar`` (pure).

    ``consts`` is ``{'content': {layer: feats}, 'style': {layer: target}}``
    where a style target is a ``W2Target`` (w2 mode) or a Gram matrix.
    """

    def features(params, image):
        return extract_features(
            params, image, cfg.all_layers, pooling=cfg.pooling,
            compute_dtype=cfg.dtype, pool_impl=cfg.maxpool_impl,
            cast_layer=cfg.cast_layer, im2col_layers=cfg.im2col_layers,
            im2col_grad=cfg.im2col_grad,
            paired_early=cfg.paired_early,
            im2col_flatten=mesh is None, sharded=mesh is not None,
        )

    if cfg.remat:
        features = jax.checkpoint(features)

    def tap_moments(layer, feat):
        if cfg.paired_early and layer <= PAIRED_LAST:
            return L.w2_moments_paired(feat)
        return L.w2_moments(feat)

    def tap_content(layer, feat):
        if cfg.paired_early and layer <= PAIRED_LAST:
            return unpair_width(feat)
        return feat

    if cfg.style_loss not in ("w2", "gram"):
        raise ValueError(f"unknown style_loss {cfg.style_loss!r}")

    def w2_total(moments, consts):
        """W2 style terms from per-layer (mean, srm) moments, grouped by
        channel count so same-C layers run their Newton-Schulz chains as one
        batched matmul sequence."""
        groups = {}
        for layer, w in zip(cfg.style_layers, cfg.style_layer_weights):
            c = consts["style"][layer].mean.shape[-1]
            groups.setdefault(c, []).append((layer, w))
        if cfg.sqrtm_impl == "pallas":
            from .ops.pallas.ns_sqrtm import (
                sqrtm_ns_lyap_pallas as sqrtm_fn,
                trace_sqrtm_ns_pallas as trace_fn,
            )
        else:
            from .ops.sqrtm import trace_sqrtm_ns as trace_fn

            sqrtm_fn = None
        if cfg.w2_grad != "trace":
            trace_fn = None
        total = jnp.asarray(0.0, jnp.float32)
        for c, items in groups.items():
            means, covs, t_mean, t_cov, t_cs, weights = [], [], [], [], [], []
            for layer, w in items:
                mean, srm = moments[layer]
                means.append(mean[0])
                covs.append(L.moments_to_cov(mean, srm, cfg.w2_eps)[0])
                tgt = consts["style"][layer]
                t_mean.append(tgt.mean[0])
                t_cov.append(tgt.cov[0])
                t_cs.append(tgt.cov_sqrt[0])
                weights.append(w)
            target = L.W2Target(
                mean=jnp.stack(t_mean), cov=jnp.stack(t_cov), cov_sqrt=jnp.stack(t_cs)
            )
            losses = L.w2_losses_batched(
                jnp.stack(means), jnp.stack(covs), target, cfg.sqrtm_iters,
                sqrtm_fn=sqrtm_fn, trace_sqrtm_fn=trace_fn,
            )
            total += jnp.sum(losses * jnp.asarray(weights, jnp.float32))
        return total

    def style_total(moments, consts):
        if cfg.style_loss == "w2":
            return w2_total(moments, consts)
        # Gram: the reference's per-pixel-normalized Gram matrix equals the
        # second raw moment, so both style losses share the moments path.
        total = jnp.asarray(0.0, jnp.float32)
        for layer, w in zip(cfg.style_layers, cfg.style_layer_weights):
            _, srm = moments[layer]
            total += w * L.scaled_mse(srm, consts["style"][layer])
        return total

    def content_total(content_acc):
        total = jnp.asarray(0.0, jnp.float32)
        for layer, w in zip(cfg.content_layers, cfg.content_weights):
            sse, sabs, cnt = content_acc[layer]
            if cfg.content_loss == "mse":
                total += w * sse / cnt
            else:  # ScaledMSE (ref :93-106)
                total += w * sse / (sabs + 1e-8)
        return total

    use_bands = cfg.n_bands >= 2 and mesh is None
    use_shard_bands = (
        cfg.shard_bands and mesh is not None
        and all(l > cfg.band_cut for l in cfg.content_layers)
    )

    def shard_banded_loss_parts(image, params, consts):
        """Early trunk shard-local (banded/paired under shard_map), deep
        trunk GSPMD from the assembled cut. Returns (moments, content_acc,
        tv)."""
        from .models.vgg import extract_features as _xf
        from .ops.banded import receptive_halo
        from .parallel.shard_early import shard_banded_stats

        cut = cfg.band_cut
        early_taps = tuple(sorted(
            {l for l in cfg.style_layers if l <= cut} | {cut}))
        late_taps = tuple(l for l in cfg.all_layers if l > cut)
        halo = cfg.band_halo if cfg.band_halo > 0 else receptive_halo(
            set(early_taps))

        def early_fn(params, slab, vr, vc):
            # Slabs are shard-local: the flattened im2col form is fine (no
            # sharded dims to merge inside the shard_map body).
            return _xf(
                params, slab, early_taps, pooling=cfg.pooling,
                compute_dtype=cfg.dtype, pool_impl=cfg.maxpool_impl,
                cast_layer=cfg.cast_layer, im2col_layers=cfg.im2col_layers,
                im2col_grad=cfg.im2col_grad,
                paired_early=cfg.paired_early,
                valid_rows=vr, valid_cols=vc,
            )

        if cfg.remat:
            early_fn = jax.checkpoint(early_fn)

        moments, cut_act = shard_banded_stats(
            mesh, early_fn, image, params,
            style_layers=cfg.style_layers,
            n_bands=cfg.n_bands,
            n_bands_w=cfg.n_bands_w,
            cut_layer=cut,
            halo=halo,
            paired_last=PAIRED_LAST if cfg.paired_early else -1,
        )

        def late_fn(x2):
            return extract_features(
                params, x2, late_taps, pooling=cfg.pooling,
                compute_dtype=cfg.dtype, pool_impl=cfg.maxpool_impl,
                start_layer=cut + 1, im2col_layers=cfg.im2col_layers,
                im2col_grad=cfg.im2col_grad,
                im2col_flatten=False, sharded=True,
            )

        if cfg.remat:
            late_fn = jax.checkpoint(late_fn)
        feats2 = late_fn(cut_act)
        moments = dict(moments)
        for layer in cfg.style_layers:
            if layer > cut:
                moments[layer] = L.w2_moments(feats2[layer])
        content_acc = {}
        for layer in cfg.content_layers:
            diff = (feats2[layer].astype(jnp.float32)
                    - consts["content"][layer].astype(jnp.float32))
            content_acc[layer] = (
                jnp.sum(jnp.square(diff)), jnp.sum(jnp.abs(diff)), diff.size
            )
        return moments, content_acc, L.tv_loss(image)

    def loss_fn(image, params, consts):
        image = constrain_image(image, mesh)
        if use_shard_bands:
            moments, content_acc, tv = shard_banded_loss_parts(
                image, params, consts)
        elif use_bands:
            from .ops.banded import banded_stats

            cut = cfg.band_cut
            early_taps = tuple(sorted(
                {l for l in cfg.all_layers if l <= cut} | {cut}))
            late_taps = tuple(l for l in cfg.all_layers if l > cut)

            def early_fn(slab):
                return extract_features(
                    params, slab, early_taps, pooling=cfg.pooling,
                    compute_dtype=cfg.dtype, pool_impl=cfg.maxpool_impl,
                    cast_layer=cfg.cast_layer,
                    im2col_layers=cfg.im2col_layers,
                    im2col_grad=cfg.im2col_grad,
                    paired_early=cfg.paired_early,
                )

            def late_fn(x2):
                return extract_features(
                    params, x2, late_taps, pooling=cfg.pooling,
                    compute_dtype=cfg.dtype, pool_impl=cfg.maxpool_impl,
                    start_layer=cut + 1, im2col_layers=cfg.im2col_layers,
                    im2col_grad=cfg.im2col_grad,
                )

            if cfg.remat:
                early_fn = jax.checkpoint(early_fn)
                late_fn = jax.checkpoint(late_fn)
            axis = 1 if cfg.band_axis == 0 else cfg.band_axis
            if (cfg.band_scan and axis == 1 and cfg.n_bands >= 3
                    and all(l > cut for l in cfg.content_layers)):
                from .ops.banded import banded_stats_scan

                moments, content_acc = banded_stats_scan(
                    early_fn, late_fn if late_taps else None, image,
                    style_layers=cfg.style_layers,
                    n_bands=cfg.n_bands,
                    cut_layer=cut,
                    halo=cfg.band_halo,
                    paired_last=PAIRED_LAST if cfg.paired_early else -1,
                    n_bands_w=cfg.n_bands_w,
                    content_targets={
                        l: consts["content"][l] for l in cfg.content_layers
                    },
                )
                tv = L.tv_loss(image)
                return (content_total(content_acc)
                        + style_total(moments, consts) + cfg.tv_weight * tv)
            moments, content_acc = banded_stats(
                early_fn, late_fn if late_taps else None, image,
                style_layers=cfg.style_layers,
                content_layers=cfg.content_layers,
                content_targets=consts["content"],
                n_bands=cfg.n_bands,
                cut_layer=cut,
                halo=cfg.band_halo,
                axis=axis,
                paired_last=PAIRED_LAST if cfg.paired_early else -1,
                n_bands_w=cfg.n_bands_w,
            )
            tv = L.tv_loss(image)
        else:
            feats = features(params, image)
            moments = {l: tap_moments(l, feats[l]) for l in cfg.style_layers}
            content_acc = {}
            for layer in cfg.content_layers:
                diff = (tap_content(layer, feats[layer]).astype(jnp.float32)
                        - consts["content"][layer].astype(jnp.float32))
                content_acc[layer] = (
                    jnp.sum(jnp.square(diff)), jnp.sum(jnp.abs(diff)), diff.size
                )
            tv = L.tv_loss(feats[INPUT])
        return (content_total(content_acc) + style_total(moments, consts)
                + cfg.tv_weight * tv)

    return loss_fn


def build_loss_terms_fn(cfg: StepConfig, mesh=None):
    """Per-term loss diagnostic: returns ``terms(image, params, consts) ->
    {name: scalar}`` with each weighted objective component separately.

    Capability parity with the reference's ``SumLoss(verbose=True)`` per-term
    printing (ref :205-207 — defined there but never enabled); here it is a
    separate pure function so the hot step never pays for it.
    """

    def features(params, image):
        return extract_features(
            params, image, cfg.all_layers, pooling=cfg.pooling,
            compute_dtype=cfg.dtype, im2col_flatten=mesh is None,
        )

    def terms(image, params, consts):
        image = constrain_image(image, mesh)
        feats = features(params, image)
        out = {}
        content_fn = L.content_mse if cfg.content_loss == "mse" else L.content_scaled
        for layer, w in zip(cfg.content_layers, cfg.content_weights):
            out[f"content_{layer}"] = w * content_fn(
                feats[layer], consts["content"][layer]
            )
        for layer, w in zip(cfg.style_layers, cfg.style_layer_weights):
            if cfg.style_loss == "w2":
                out[f"style_w2_{layer}"] = w * L.w2_loss(
                    feats[layer], consts["style"][layer], cfg.w2_eps, cfg.sqrtm_iters
                )
            else:
                out[f"style_gram_{layer}"] = w * L.gram_loss(
                    feats[layer], consts["style"][layer]
                )
        out["tv"] = cfg.tv_weight * L.tv_loss(feats[INPUT])
        return out

    return terms


def adam_init(image) -> AdamState:
    return AdamState(
        mu=jnp.zeros_like(image),
        nu=jnp.zeros_like(image),
        count=jnp.zeros((), jnp.int32),
    )


def _adam_apply(cfg: StepConfig, opt: AdamState, g):
    """PyTorch-semantics Adam (bias-corrected, eps outside the sqrt)."""
    count = opt.count + 1
    mu = cfg.beta1 * opt.mu + (1.0 - cfg.beta1) * g
    nu = cfg.beta2 * opt.nu + (1.0 - cfg.beta2) * jnp.square(g)
    t = count.astype(jnp.float32)
    mhat = mu / (1.0 - jnp.power(cfg.beta1, t))
    vhat = nu / (1.0 - jnp.power(cfg.beta2, t))
    update = cfg.step_size * mhat / (jnp.sqrt(vhat) + cfg.adam_eps)
    return update, AdamState(mu=mu, nu=nu, count=count)


def make_adam_runner(cfg: StepConfig, mesh=None):
    """Compile-once chunk runner: scans the fused Adam step ``n_steps`` times.

    Returns a jitted ``run(params, consts, state, n_steps) -> (state, losses)``
    with ``n_steps`` static and the state donated (no HBM copies between
    chunks).
    """
    loss_fn = build_loss_fn(cfg, mesh)
    grad_fn = jax.value_and_grad(loss_fn)

    # NOTE: carrying the state as flat 1-D arrays (to dodge the C=3 image's
    # H-minor T(4,128) layout in the Adam/EMA epilogue) was measured NET
    # SLOWER at every size (512px +12%, 2048 +13%, 2896 +20%): the reshape
    # boundary relayouts outweigh the epilogue savings. See PERF.md r2.
    @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(2,))
    def run(params, consts, state: LoopState, n_steps: int):
        def step(carry: LoopState, _):
            loss, g = grad_fn(carry.image, params, consts)
            update, opt = _adam_apply(cfg, carry.opt, g)
            image = jnp.clip(carry.image - update, 0.0, 1.0)
            image = constrain_image(image, mesh)
            ema = ema_update(carry.ema, image, cfg.avg_decay)
            return LoopState(image=image, opt=opt, ema=ema), loss

        return jax.lax.scan(step, state, None, length=n_steps)

    return run


class LBFGSState(NamedTuple):
    """Fixed-size circular L-BFGS history (torch.optim.LBFGS semantics)."""

    s_hist: jnp.ndarray  # (m, *image) past steps s_k = t_k * d_k
    y_hist: jnp.ndarray  # (m, *image) past gradient differences
    rho: jnp.ndarray  # (m,) 1 / (y_k . s_k)
    num_old: jnp.ndarray  # i32: valid history entries
    head: jnp.ndarray  # i32: index of the oldest entry (circular)
    d: jnp.ndarray  # (*image) last search direction
    t: jnp.ndarray  # f32: last step length
    prev_grad: jnp.ndarray  # (*image)
    h_diag: jnp.ndarray  # f32: initial Hessian scaling
    n_iter: jnp.ndarray  # i32: global iteration count


_LBFGS_MEMORY = 10
_LBFGS_TOL_GRAD = 1e-7
_LBFGS_TOL_CHANGE = 1e-9
_LBFGS_YS_MIN = 1e-10


def lbfgs_init(image, memory_size: int = _LBFGS_MEMORY) -> LBFGSState:
    # Distinct zero buffers per leaf: the runner donates the state, and a
    # buffer shared across leaves cannot be donated twice.
    return LBFGSState(
        s_hist=jnp.zeros((memory_size, *image.shape), image.dtype),
        y_hist=jnp.zeros((memory_size, *image.shape), image.dtype),
        rho=jnp.zeros((memory_size,), jnp.float32),
        num_old=jnp.zeros((), jnp.int32),
        head=jnp.zeros((), jnp.int32),
        d=jnp.zeros_like(image),
        t=jnp.zeros((), jnp.float32),
        prev_grad=jnp.zeros_like(image),
        h_diag=jnp.ones((), jnp.float32),
        n_iter=jnp.zeros((), jnp.int32),
    )


def _vdot(a, b):
    return jnp.vdot(a.astype(jnp.float32), b.astype(jnp.float32))


def _lbfgs_direction(state: LBFGSState, g, lr: float):
    """One torch-semantics L-BFGS direction/step-length computation.

    Matches ``torch.optim.LBFGS`` with ``max_iter=1, history_size=m,
    line_search_fn=None`` (the reference's configuration, ref
    style_transfer.py:464-467): history update gated on ``ys > 1e-10``,
    two-loop recursion seeded with ``h_diag = ys / yy``, first-iteration
    step length ``min(1, 1/sum|g|) * lr``, then ``lr``.
    """
    m = state.s_hist.shape[0]
    first = state.n_iter == 0

    # --- history update (skipped on the first iteration) -----------------
    y = g - state.prev_grad
    s = state.d * state.t
    ys = _vdot(y, s)
    insert = jnp.logical_and(jnp.logical_not(first), ys > _LBFGS_YS_MIN)
    slot = (state.head + state.num_old) % m
    upd = insert.astype(state.s_hist.dtype)
    s_hist = state.s_hist.at[slot].set(
        upd * s + (1 - upd) * state.s_hist[slot]
    )
    y_hist = state.y_hist.at[slot].set(
        upd * y + (1 - upd) * state.y_hist[slot]
    )
    rho = state.rho.at[slot].set(
        jnp.where(insert, 1.0 / jnp.maximum(ys, _LBFGS_YS_MIN), state.rho[slot])
    )
    full = state.num_old == m
    num_old = jnp.where(
        insert, jnp.minimum(state.num_old + 1, m), state.num_old
    )
    head = jnp.where(jnp.logical_and(insert, full), (state.head + 1) % m,
                     state.head)
    h_diag = jnp.where(insert, ys / jnp.maximum(_vdot(y, y), 1e-30),
                       state.h_diag)

    # --- two-loop recursion ----------------------------------------------
    def phys(j):
        return (head + j) % m

    def rev_body(k, carry):
        q, al = carry
        j = m - 1 - k  # logical index, newest -> oldest
        i = phys(j)
        active = (j < num_old).astype(jnp.float32)
        a_j = active * rho[i] * _vdot(s_hist[i], q)
        q = q - a_j * y_hist[i]
        return q, al.at[j].set(a_j)

    q0 = -g
    q, al = jax.lax.fori_loop(
        0, m, rev_body, (q0, jnp.zeros((m,), jnp.float32))
    )
    r0 = q * h_diag

    def fwd_body(j, r):
        i = phys(j)
        active = (j < num_old).astype(jnp.float32)
        be = active * rho[i] * _vdot(y_hist[i], r)
        return r + active * (al[j] - be) * s_hist[i]

    r = jax.lax.fori_loop(0, m, fwd_body, r0)

    d = jnp.where(first, -g, r)
    t = jnp.where(
        first,
        jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.sum(jnp.abs(g)), 1e-30)) * lr,
        lr,
    ).astype(jnp.float32)
    new_state = LBFGSState(
        s_hist=s_hist, y_hist=y_hist, rho=rho, num_old=num_old, head=head,
        d=d, t=t, prev_grad=g, h_diag=h_diag, n_iter=state.n_iter + 1,
    )
    return d, t, new_state


def lbfgs_step(state: LBFGSState, image, g, lr: float):
    """Returns (new_image, new_state) for one reference-flavor iteration."""
    opt_cond = jnp.max(jnp.abs(g)) <= _LBFGS_TOL_GRAD
    d, t, new_state = _lbfgs_direction(state, g, lr)
    gtd = _vdot(g, d)
    take = jnp.logical_and(jnp.logical_not(opt_cond), gtd <= -_LBFGS_TOL_CHANGE)
    new_image = image + take.astype(image.dtype) * t * d
    # If converged (opt_cond), torch returns before touching any state.
    new_state = jax.tree.map(
        lambda frozen, nxt: jnp.where(opt_cond, frozen, nxt), state, new_state
    )
    return new_image, new_state


def make_lbfgs_runner(cfg: StepConfig, mesh=None):
    """Reference-flavor L-BFGS chunk runner.

    Matches the reference's ``optim.LBFGS(max_iter=1, history_size=10)`` with
    default lr=1.0 and NO line search (ref style_transfer.py:464-467): a
    two-loop recursion over a fixed 10-deep (s, y) history, fixed step
    length, no box clamp mid-run (ref :482-485 skips the clamp for lbfgs).
    Implemented as an explicit fixed-shape circular buffer so the whole chunk
    scans inside one XLA program. ``cfg.step_size`` is ignored (the reference
    passes no lr to LBFGS — torch default 1.0).
    """
    loss_fn = build_loss_fn(cfg, mesh)

    def init(image, params, consts):
        return lbfgs_init(image)

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(2,))
    def run(params, consts, state: LoopState, n_steps: int):
        def step(carry: LoopState, _):
            loss, g = jax.value_and_grad(loss_fn)(carry.image, params, consts)
            image, opt_state = lbfgs_step(carry.opt, carry.image, g, lr=1.0)
            image = constrain_image(image, mesh)
            ema = ema_update(carry.ema, image, cfg.avg_decay)
            return LoopState(image=image, opt=opt_state, ema=ema), loss

        return jax.lax.scan(step, state, None, length=n_steps)

    return run, init


def make_lbfgs_zoom_runner(cfg: StepConfig, mesh=None):
    """L-BFGS chunk runner (optax.lbfgs, memory 10, zoom linesearch).

    A stronger-per-iteration alternative to the reference's fixed-step
    L-BFGS (see :func:`make_lbfgs_runner`); each iteration runs a zoom line
    search, so it costs several extra forward passes.
    """
    import optax

    opt = optax.lbfgs(memory_size=10)
    loss_fn = build_loss_fn(cfg, mesh)

    def init(image, params, consts):
        return opt.init(image)

    # No donation here: the optax L-BFGS state aliases the params buffer at
    # init, and donating the same buffer twice is an XLA error.
    @partial(jax.jit, static_argnames=("n_steps",))
    def run(params, consts, state: LoopState, n_steps: int):
        def value_fn(img):
            return loss_fn(img, params, consts)

        def step(carry: LoopState, _):
            loss, g = jax.value_and_grad(value_fn)(carry.image)
            updates, opt_state = opt.update(
                g, carry.opt, carry.image, value=loss, grad=g, value_fn=value_fn
            )
            image = optax.apply_updates(carry.image, updates)
            image = constrain_image(image, mesh)
            ema = ema_update(carry.ema, image, cfg.avg_decay)
            return LoopState(image=image, opt=opt_state, ema=ema), loss

        return jax.lax.scan(step, state, None, length=n_steps)

    return run, init
