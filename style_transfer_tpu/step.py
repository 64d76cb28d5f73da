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

from .models.vgg import INPUT, extract_features
from .ops import losses as L
from .parallel.mesh import constrain_image
from .utils.ema import EMAState, ema_update

__all__ = ["StepConfig", "AdamState", "LoopState", "make_adam_runner", "make_lbfgs_runner"]


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
    maxpool_impl: str = "xla"  # 'xla' | 'pallas' (fused pool fwd/bwd kernel)
    remat: bool = False

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
        )

    if cfg.remat:
        features = jax.checkpoint(features)

    if cfg.style_loss not in ("w2", "gram"):
        raise ValueError(f"unknown style_loss {cfg.style_loss!r}")

    def w2_total(feats, consts):
        """W2 style terms, grouped by channel count so same-C layers run
        their Newton-Schulz chains as one batched matmul sequence."""
        groups = {}
        for layer, w in zip(cfg.style_layers, cfg.style_layer_weights):
            c = consts["style"][layer].mean.shape[-1]
            groups.setdefault(c, []).append((layer, w))
        if cfg.sqrtm_impl == "pallas":
            from .ops.pallas.ns_sqrtm import sqrtm_ns_lyap_pallas as sqrtm_fn
        else:
            sqrtm_fn = None
        total = jnp.asarray(0.0, jnp.float32)
        for c, items in groups.items():
            means, covs, t_mean, t_cov, t_cs, weights = [], [], [], [], [], []
            for layer, w in items:
                mean, srm = L.w2_moments(feats[layer])
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
                sqrtm_fn=sqrtm_fn,
            )
            total += jnp.sum(losses * jnp.asarray(weights, jnp.float32))
        return total

    def loss_fn(image, params, consts):
        image = constrain_image(image, mesh)
        feats = features(params, image)
        content_fn = L.content_mse if cfg.content_loss == "mse" else L.content_scaled
        total = jnp.asarray(0.0, jnp.float32)
        for layer, w in zip(cfg.content_layers, cfg.content_weights):
            total += w * content_fn(feats[layer], consts["content"][layer])
        if cfg.style_loss == "w2":
            total += w2_total(feats, consts)
        elif cfg.style_loss == "gram":
            for layer, w in zip(cfg.style_layers, cfg.style_layer_weights):
                total += w * L.gram_loss(feats[layer], consts["style"][layer])
        else:
            raise ValueError(f"unknown style_loss {cfg.style_loss!r}")
        total += cfg.tv_weight * L.tv_loss(feats[INPUT])
        return total

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
            params, image, cfg.all_layers, pooling=cfg.pooling, compute_dtype=cfg.dtype
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


def make_lbfgs_runner(cfg: StepConfig, mesh=None):
    """L-BFGS chunk runner (optax.lbfgs, memory 10, zoom linesearch).

    Parity with the reference's ``optim.LBFGS(max_iter=1, history_size=10)``
    path (ref :464-467): one quasi-Newton step per iteration, no box clamp
    (clamping mid-run corrupts the L-BFGS history, ref :482-485).
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
