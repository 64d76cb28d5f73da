"""Fused step: Adam semantics vs torch.optim.Adam, warm-start moment resize,
clamping, EMA threading (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from style_transfer_tpu.engine import _scale_adam
from style_transfer_tpu.step import AdamState, StepConfig, _adam_apply, adam_init


def test_adam_matches_torch_trajectory():
    """Our hand-rolled Adam must track torch.optim.Adam (the reference's
    optimizer, betas=(0.9, 0.99)) step for step on a fixed quadratic."""
    rng = np.random.RandomState(0)
    x0 = rng.randn(6).astype(np.float32)
    target = rng.randn(6).astype(np.float32)
    lr, betas = 0.02, (0.9, 0.99)

    xt = torch.tensor(x0, requires_grad=True)
    opt = torch.optim.Adam([xt], lr=lr, betas=betas)
    torch_traj = []
    for _ in range(25):
        opt.zero_grad()
        loss = ((xt - torch.tensor(target)) ** 2).sum()
        loss.backward()
        opt.step()
        torch_traj.append(xt.detach().numpy().copy())

    cfg = StepConfig(step_size=lr, beta1=betas[0], beta2=betas[1])
    xj = jnp.asarray(x0)
    state = AdamState(mu=jnp.zeros(6), nu=jnp.zeros(6), count=jnp.zeros((), jnp.int32))
    for i in range(25):
        g = jax.grad(lambda v: jnp.sum((v - target) ** 2))(xj)
        update, state = _adam_apply(cfg, state, g)
        xj = xj - update
        np.testing.assert_allclose(np.asarray(xj), torch_traj[i], rtol=2e-4, atol=2e-5)


def test_adam_init_zero():
    img = jnp.ones((1, 4, 4, 3))
    st = adam_init(img)
    assert float(jnp.sum(jnp.abs(st.mu))) == 0.0
    assert int(st.count) == 0


def test_scale_adam_resize_semantics():
    """Warm start: mu bicubic, nu bilinear clamped >= 0, count preserved
    (ref :285-295)."""
    rng = np.random.RandomState(1)
    mu = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    nu = jnp.asarray(np.abs(rng.randn(1, 8, 8, 3)).astype(np.float32))
    st = AdamState(mu=mu, nu=nu, count=jnp.asarray(17, jnp.int32))
    out = _scale_adam(st, (12, 16))
    assert out.mu.shape == (1, 12, 16, 3)
    assert out.nu.shape == (1, 12, 16, 3)
    assert int(out.count) == 17
    assert float(jnp.min(out.nu)) >= 0.0


def test_runner_scan_loss_decreases(vgg_params):
    from style_transfer_tpu.ops import losses as L
    from style_transfer_tpu.models.vgg import extract_features
    from style_transfer_tpu.step import LoopState, make_adam_runner
    from style_transfer_tpu.utils.ema import ema_init

    rng = np.random.RandomState(2)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    cfg = StepConfig(compute_dtype=None)

    cf = extract_features(vgg_params, content, cfg.content_layers)
    sf = extract_features(vgg_params, style, cfg.style_layers)
    consts = {
        "content": {l: cf[l] for l in cfg.content_layers},
        "style": {l: L.w2_target(*L.w2_moments(sf[l])) for l in cfg.style_layers},
    }
    runner = make_adam_runner(cfg)
    state = LoopState(image=image, opt=adam_init(image), ema=ema_init(image, 0.99))
    state, losses = runner(vgg_params, consts, state, 40)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    img = np.asarray(state.image)
    assert img.min() >= 0.0 and img.max() <= 1.0  # box constraint enforced
