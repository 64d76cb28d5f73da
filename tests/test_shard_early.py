"""Shard-local early trunk (parallel/shard_early.py): the single-chip
banded / width-paired / 2D-grid formulations composed with the SPMD mesh
must reproduce the MONOLITHIC single-device step exactly (VERDICT r3 #1).

The capability anchor is the reference's 2-GPU layer split
(``/root/reference/style_transfer/style_transfer.py:326-333``); here the
whole early trunk runs per shard under shard_map with explicit halo
exchanges, so every shard executes the same optimized program the
single-chip engine would pick for a canvas of its block size."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models.vgg import extract_features
from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.parallel.mesh import make_mesh, shard_image
from style_transfer_tpu.parallel.shard_early import shardable
from style_transfer_tpu.step import (
    LoopState,
    StepConfig,
    adam_init,
    build_loss_fn,
    make_adam_runner,
)
from style_transfer_tpu.utils.ema import ema_init


def _consts(params, cfg, rng):
    content = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    style = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    cf = extract_features(params, content, cfg.content_layers)
    sf = extract_features(params, style, cfg.style_layers)
    return {
        "content": {l: cf[l] for l in cfg.content_layers},
        "style": {l: L.w2_target(*L.w2_moments(sf[l]))
                  for l in cfg.style_layers},
    }


def test_shardable_gate():
    mesh = make_mesh(n_devices=8)  # 4 x 2
    assert shardable(128, 128, mesh)  # blocks 32 x 64
    assert not shardable(120, 128, mesh)  # H not 16*4-divisible
    assert not shardable(128, 120, mesh)
    assert not shardable(128, 128, None)


SHARD_CFGS = {
    "banded": dict(n_bands=2),
    "banded+paired": dict(n_bands=2, paired_early=True),
    "grid+paired+im2col": dict(n_bands=2, n_bands_w=2, paired_early=True,
                               im2col_layers=(10,)),
}


@pytest.mark.parametrize("name", sorted(SHARD_CFGS))
def test_shard_banded_loss_and_grad_match_monolithic(vgg_params, name):
    """loss+grad of the composed shard-local step == the monolithic single
    device step (f32; float-reassociation tolerance only). Bands, the 2D
    slab grid and the width-paired trunk are all interpreted PER SHARD."""
    kw = SHARD_CFGS[name]
    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    cfg_ref = StepConfig(compute_dtype=None)
    consts = _consts(vgg_params, cfg_ref, rng)
    cfg_sh = StepConfig(compute_dtype=None, shard_bands=True,
                        maxpool_impl="auto", **kw)

    mesh = make_mesh(n_devices=8)
    loss_ref, g_ref = jax.jit(jax.value_and_grad(build_loss_fn(cfg_ref)))(
        image, vgg_params, consts)
    loss_sh, g_sh = jax.jit(
        jax.value_and_grad(build_loss_fn(cfg_sh, mesh)))(
        shard_image(image, mesh), vgg_params, consts)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    a, b = np.asarray(g_ref), np.asarray(g_sh)
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-12) < 1e-3


def test_shard_banded_step_no_all_gather(vgg_params):
    """The composed config must still move only halo strips and reduced
    statistics: collective-permute (explicit exchange + GSPMD deep halos)
    and all-reduce (moment psums) — never an all-gather of an activation."""
    rng = np.random.RandomState(4)
    image = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    cfg = StepConfig(compute_dtype="bfloat16", shard_bands=True, n_bands=2,
                     n_bands_w=2, paired_early=True, maxpool_impl="auto",
                     im2col_layers=(10, 19, 28))
    consts = _consts(vgg_params, cfg, rng)
    mesh = make_mesh(n_devices=8)
    runner = make_adam_runner(cfg, mesh)
    x = shard_image(image, mesh)
    state = LoopState(image=x, opt=adam_init(x), ema=ema_init(x, 0.99))
    text = runner.lower(vgg_params, consts, state, 2).compile().as_text()
    assert "all-gather(" not in text, "sharded step all-gathers an activation"
    assert "all-to-all(" not in text
    assert "collective-permute(" in text  # the halo exchanges are real

    # And the fused bf16 chunk still matches the unsharded bf16 chunk.
    state_sh, loss_sh = runner(vgg_params, consts, state, 3)
    runner1 = make_adam_runner(StepConfig(compute_dtype="bfloat16"), None)
    state1 = LoopState(image=image, opt=adam_init(image),
                       ema=ema_init(image, 0.99))
    state1, loss1 = runner1(vgg_params, consts, state1, 3)
    np.testing.assert_allclose(
        np.asarray(loss_sh), np.asarray(loss1), rtol=2e-2)
    assert np.abs(np.asarray(state_sh.image)
                  - np.asarray(state1.image)).mean() < 0.01


def test_auto_knobs_resolve_shard_local():
    """Meshed auto knobs = the single-chip knobs of the per-shard block:
    each chip of a 2x2 mesh at 2896x2172 owns 1448x1086 — the regime where
    banding/grid/pairing won 20-35% single-chip (VERDICT r3 next #1)."""
    from style_transfer_tpu.engine import auto_size_knobs

    got = auto_size_knobs(2880, 2176, is_tpu=True, meshed=True,
                          mesh_shape=(2, 2))
    local = auto_size_knobs(1440, 1088, is_tpu=True)
    assert got["shard_bands"] is True
    for k in ("n_bands", "n_bands_w", "paired_early", "im2col_layers"):
        assert got[k] == local[k], k
    assert got["n_bands"] >= 2 and got["paired_early"] is True

    # Non-divisible dims and sub-threshold blocks fall back to plain GSPMD.
    assert auto_size_knobs(2890, 2172, is_tpu=True, meshed=True,
                           mesh_shape=(2, 2))["shard_bands"] is False
    small = auto_size_knobs(256, 256, is_tpu=True, meshed=True,
                            mesh_shape=(2, 2))
    assert small["shard_bands"] is False and small["n_bands"] == 0
