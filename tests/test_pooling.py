"""Pooling variants vs PyTorch ground truth (torch CPU is available for
cross-checking semantics; torchvision is not required)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from style_transfer_tpu.ops.pooling import POOLING_SCALES, pool2x2, replicate_pad2d, safe_sqrt


def nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


@pytest.mark.parametrize("hw", [(8, 8), (7, 9), (5, 5)])
def test_max_pool_matches_torch(hw):
    rng = np.random.RandomState(0)
    x = rng.randn(1, *hw, 3).astype(np.float32)
    ours = np.asarray(pool2x2(jnp.asarray(x), "max"))
    theirs = torch.nn.MaxPool2d(2)(torch.from_numpy(nhwc_to_nchw(x))).numpy()
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 3, 1)), rtol=1e-6)


@pytest.mark.parametrize("hw", [(8, 8), (7, 9)])
def test_avg_pool_matches_torch(hw):
    rng = np.random.RandomState(1)
    x = rng.randn(1, *hw, 3).astype(np.float32)
    ours = np.asarray(pool2x2(jnp.asarray(x), "average"))
    theirs = torch.nn.AvgPool2d(2)(torch.from_numpy(nhwc_to_nchw(x))).numpy()
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 3, 1)), rtol=1e-5)


@pytest.mark.parametrize("hw", [(8, 8), (7, 9)])
def test_l2_pool_matches_torch_lppool(hw):
    # LPPool2d(2, 2) = sqrt of the *sum* (not mean) of squares over the window.
    rng = np.random.RandomState(2)
    x = np.abs(rng.randn(1, *hw, 3)).astype(np.float32)  # post-ReLU domain
    ours = np.asarray(pool2x2(jnp.asarray(x), "l2"))
    theirs = torch.nn.LPPool2d(2, 2)(torch.from_numpy(nhwc_to_nchw(x))).numpy()
    np.testing.assert_allclose(
        ours, np.transpose(theirs, (0, 2, 3, 1)), rtol=1e-4, atol=1e-6
    )


def test_pooling_scales_reference_values():
    assert POOLING_SCALES == {"max": 1.0, "average": 2.0, "l2": 0.78}


def test_safe_sqrt_grad_finite_at_zero():
    g = jax.grad(lambda v: jnp.sum(safe_sqrt(v)))(jnp.zeros((4,)))
    assert np.all(np.asarray(g) == 0.0)
    g1 = jax.grad(lambda v: jnp.sum(safe_sqrt(v)))(jnp.full((4,), 4.0))
    np.testing.assert_allclose(np.asarray(g1), 0.25, rtol=1e-6)


def test_replicate_pad_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 5, 6, 3).astype(np.float32)
    ours = np.asarray(replicate_pad2d(jnp.asarray(x), 1))
    theirs = F.pad(torch.from_numpy(nhwc_to_nchw(x)), (1, 1, 1, 1), "replicate").numpy()
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 3, 1)), rtol=1e-6)


@pytest.mark.parametrize("impl", ["paired", "first"])
@pytest.mark.parametrize("hw", [(8, 8), (7, 9), (6, 10)])
def test_max_pool_impls_match_xla(impl, hw):
    rng = np.random.RandomState(1)
    x = rng.randn(1, *hw, 4).astype(np.float32)
    base = np.asarray(pool2x2(jnp.asarray(x), "max", "xla"))
    alt = np.asarray(pool2x2(jnp.asarray(x), "max", impl))
    np.testing.assert_allclose(alt, base, rtol=1e-6)


@pytest.mark.parametrize("hw", [(8, 8), (7, 9), (6, 10)])
def test_max_pool_first_backward_torch_exact_on_ties(hw):
    """'first' decomposes 2x2 max into W-pair then H-pair first_max, which
    must reproduce torch max_pool2d's row-major first-max tie routing
    BIT-EXACTLY — including on exact ties (integer-valued inputs force
    many, as do post-ReLU zeros). Also checked against XLA's
    select_and_scatter backward (the 'xla' impl), which shares the rule."""
    rng = np.random.RandomState(7)
    x = rng.randint(-2, 3, (1, *hw, 4)).astype(np.float32)
    hp, wp = hw[0] // 2, hw[1] // 2
    g = rng.randn(1, hp, wp, 4).astype(np.float32)

    y_first, vjp_first = jax.vjp(
        lambda v: pool2x2(v, "max", "first"), jnp.asarray(x))
    y_xla, vjp_xla = jax.vjp(
        lambda v: pool2x2(v, "max", "xla"), jnp.asarray(x))
    assert np.array_equal(np.asarray(y_first), np.asarray(y_xla))
    g_first = np.asarray(vjp_first(jnp.asarray(g))[0])
    g_xla = np.asarray(vjp_xla(jnp.asarray(g))[0])
    assert np.array_equal(g_first, g_xla)

    xt = torch.tensor(nhwc_to_nchw(x), requires_grad=True)
    yt = F.max_pool2d(xt, 2)
    yt.backward(torch.tensor(nhwc_to_nchw(g)))
    gt = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))
    assert np.array_equal(g_first, gt)
