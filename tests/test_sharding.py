"""SPMD spatial sharding: sharded == unsharded on a forced 8-device CPU mesh
(SURVEY.md §4.4 — the multi-chip test the reference never had)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models.vgg import extract_features
from style_transfer_tpu.parallel.mesh import (
    factor_devices,
    image_sharding,
    make_mesh,
    shard_image,
)


def test_factor_devices():
    assert factor_devices(1) == (1, 1)
    assert factor_devices(2) == (2, 1)
    assert factor_devices(4) == (2, 2)
    assert factor_devices(8) == (4, 2)
    assert factor_devices(6) == (3, 2)


def test_mesh_shapes():
    mesh = make_mesh(n_devices=8)
    assert mesh.shape == {"sph": 4, "spw": 2}
    mesh2 = make_mesh(jax.devices()[:4])
    assert mesh2.shape == {"sph": 2, "spw": 2}


def test_sharded_features_match_unsharded(vgg_params):
    rng = np.random.RandomState(0)
    img = rng.rand(1, 64, 96, 3).astype(np.float32)
    taps = (1, 6, 11, 20, 29)

    ref = extract_features(vgg_params, jnp.asarray(img), taps)

    mesh = make_mesh(n_devices=8)
    sharded = shard_image(jnp.asarray(img), mesh)
    assert len(sharded.sharding.device_set) == 8

    fn = jax.jit(lambda p, x: {l: extract_features(p, x, taps)[l] for l in taps})
    out = fn(vgg_params, sharded)
    for l in taps:
        a = np.asarray(ref[l], np.float32)
        b = np.asarray(out[l], np.float32)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "cfg_kw",
    [
        {},
        # The shipped TPU mesh configuration: im2col deep convs with the
        # conv-transpose backward (engine auto_size_knobs defaults) must be
        # numerically guarded under sharding, not just compile-guarded by
        # the no-all-gather assert (ADVICE r4).
        {"im2col_layers": (10, 19, 28), "im2col_grad": "conv"},
    ],
    ids=["default", "im2col-convgrad"],
)
def test_sharded_full_step_matches_unsharded(vgg_params, cfg_kw):
    """One fused Adam step, sharded over 8 devices vs single device: the
    whole train-step program (conv halo exchanges, psum'd statistics,
    sqrtm, Adam, EMA) must agree."""
    from style_transfer_tpu.ops import losses as L
    from style_transfer_tpu.step import LoopState, StepConfig, adam_init, make_adam_runner
    from style_transfer_tpu.utils.ema import ema_init

    rng = np.random.RandomState(1)
    image = rng.rand(1, 64, 96, 3).astype(np.float32)
    content = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    cfg = StepConfig(compute_dtype=None, **cfg_kw)

    cf = extract_features(vgg_params, content, cfg.content_layers)
    sf = extract_features(vgg_params, style, cfg.style_layers)
    consts = {
        "content": {l: cf[l] for l in cfg.content_layers},
        "style": {l: L.w2_target(*L.w2_moments(sf[l])) for l in cfg.style_layers},
    }

    # Gradients must agree tightly (reduction order differs under psum, so
    # tolerance is float-roundoff scale, not exact).
    from style_transfer_tpu.step import build_loss_fn

    mesh = make_mesh(n_devices=8)
    g_ref = jax.jit(jax.grad(build_loss_fn(cfg)))(
        jnp.asarray(image), vgg_params, consts
    )
    g_sh = jax.jit(jax.grad(build_loss_fn(cfg, mesh)))(
        shard_image(jnp.asarray(image), mesh), vgg_params, consts
    )
    a, b = np.asarray(g_ref), np.asarray(g_sh)
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-12) < 1e-3

    # Adam trajectories amplify sign flips of near-zero gradient components
    # (first update is ~ lr * sign(g)); compare losses and images loosely.
    def run(mesh, img):
        runner = make_adam_runner(cfg, mesh)
        x = shard_image(jnp.asarray(img), mesh)
        state = LoopState(image=x, opt=adam_init(x), ema=ema_init(x, 0.99))
        state, losses = runner(vgg_params, consts, state, 5)
        return np.asarray(state.image), np.asarray(losses)

    img_ref, loss_ref = run(None, image)
    img_sh, loss_sh = run(mesh, image)
    np.testing.assert_allclose(loss_sh, loss_ref, rtol=5e-3)
    assert np.abs(img_sh - img_ref).mean() < 0.01


def test_sharded_step_has_no_all_gather(vgg_params):
    """The sharded step must move only halo strips (collective-permute) and
    reduced statistics (all-reduce) over the mesh — never a full activation.
    Regression guard for the im2col flatten bug: the (n*h*w, 9c) patch-matrix
    reshape merged the sharded W dim into the matmul rows, and GSPMD
    responded by all-gathering the full f32 patch tensor every iteration
    (127 MB/step at print sizes)."""
    from style_transfer_tpu.ops import losses as L
    from style_transfer_tpu.step import (
        LoopState, StepConfig, adam_init, make_adam_runner,
    )
    from style_transfer_tpu.utils.ema import ema_init

    rng = np.random.RandomState(2)
    image = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    content = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    # im2col deep layers + paired-capable pooling: the configs the engine
    # actually runs on TPU meshes.
    cfg = StepConfig(compute_dtype="bfloat16", maxpool_impl="auto",
                     im2col_layers=(10, 19, 28), im2col_grad="conv")

    cf = extract_features(vgg_params, content, cfg.content_layers)
    sf = extract_features(vgg_params, style, cfg.style_layers)
    consts = {
        "content": {l: cf[l] for l in cfg.content_layers},
        "style": {l: L.w2_target(*L.w2_moments(sf[l])) for l in cfg.style_layers},
    }
    mesh = make_mesh(n_devices=8)
    runner = make_adam_runner(cfg, mesh)
    x = shard_image(image, mesh)
    state = LoopState(image=x, opt=adam_init(x), ema=ema_init(x, 0.99))
    text = runner.lower(vgg_params, consts, state, 2).compile().as_text()
    assert "all-gather(" not in text, "sharded step all-gathers an activation"
    assert "all-to-all(" not in text

    # And the TPU-config sharded numerics (auto paired pools, im2col deep
    # convs, rank-4 im2col contraction) must still match the unsharded step.
    state_sh, loss_sh = runner(vgg_params, consts, state, 3)
    runner1 = make_adam_runner(cfg, None)
    state1 = LoopState(image=image, opt=adam_init(image),
                       ema=ema_init(image, 0.99))
    state1, loss1 = runner1(vgg_params, consts, state1, 3)
    np.testing.assert_allclose(
        np.asarray(loss_sh), np.asarray(loss1), rtol=2e-2)
    assert np.abs(np.asarray(state_sh.image)
                  - np.asarray(state1.image)).mean() < 0.01


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 4, 8])
def test_engine_multidevice_smoke(n, content_pil, style_pil):
    """Whole engine on an n-device mesh (uneven H split included)."""
    from style_transfer_tpu.engine import StyleTransfer
    from style_transfer_tpu.models.weights import random_params

    st = StyleTransfer(
        devices=jax.devices()[:n], weights=random_params(0), callback_chunk=5
    )
    losses = []
    st.stylize(
        content_pil, [style_pil], min_scale=67, end_scale=67,
        iterations=10, initial_iterations=10,
        callback=lambda it: losses.append(it.loss),
    )
    assert len(losses) == 10
    assert losses[-1] < losses[0]


def test_multihost_helper_single_host(monkeypatch):
    from style_transfer_tpu.parallel import multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert multihost.initialize() is False  # no-op without a coordinator
    assert multihost.is_multihost() is False
    assert multihost.local_device_count() >= 1


@pytest.mark.slow
def test_engine_multidevice_pyramid_prefetch(content_pil, style_pil):
    """Two-scale pyramid on a mesh exercises the sharded AOT prefetch path
    (scale 2's program compiles from sharded dummies during scale 1)."""
    from style_transfer_tpu.engine import StyleTransfer
    from style_transfer_tpu.models.weights import random_params

    st = StyleTransfer(
        devices=jax.devices()[:8], weights=random_params(0), callback_chunk=5
    )
    losses = []
    st.stylize(
        content_pil, [style_pil], min_scale=64, end_scale=96,
        iterations=10, initial_iterations=10,
        callback=lambda it: losses.append(it.loss),
    )
    assert len(losses) == 20
    assert np.isfinite(losses).all()


def test_sharded_im2col_matches_unsharded():
    """im2col conv layers (engine TPU default, StepConfig.im2col_layers)
    under GSPMD spatial sharding: the concat-of-shifted-slices im2col must
    partition with halo exchanges exactly like the conv it replaces."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from style_transfer_tpu.models.vgg import extract_features
    from style_transfer_tpu.models.weights import random_params
    from style_transfer_tpu.parallel.mesh import make_mesh, shard_image

    params = {k: jnp.asarray(v) for k, v in random_params(0).items()}
    rng = np.random.RandomState(7)
    image = jnp.asarray(rng.rand(1, 96, 128, 3).astype(np.float32))
    mesh = make_mesh(jax.devices()[:8])

    def feats(img):
        out = extract_features(params, img, [11, 29],
                               im2col_layers=(10, 28))
        return out[11], out[29]

    ref = jax.jit(feats)(image)
    sharded_img = shard_image(image, mesh)
    got = jax.jit(feats)(sharded_img)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)
