"""Fidelity metrics sanity (PSNR/SSIM/VGG distance)."""

import numpy as np
import pytest

from style_transfer_tpu.utils.metrics import psnr, ssim, vgg_distance


@pytest.fixture()
def imgs():
    rng = np.random.RandomState(0)
    a = rng.rand(48, 64, 3)
    noise = rng.randn(48, 64, 3) * 0.05
    return a, np.clip(a + noise, 0, 1)


def test_psnr_identity_and_order(imgs):
    a, b = imgs
    assert psnr(a, a) == float("inf")
    p_noisy = psnr(a, b)
    p_noisier = psnr(a, np.clip(a + 0.2, 0, 1))
    assert p_noisy > p_noisier > 0


def test_psnr_known_value():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(psnr(a, b), 20.0, rtol=1e-6)


def test_ssim_bounds(imgs):
    a, b = imgs
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    s = ssim(a, b)
    assert 0 < s < 1
    assert ssim(a, 1 - a) < s


def test_shape_mismatch():
    with pytest.raises(ValueError):
        psnr(np.zeros((4, 4, 3)), np.zeros((5, 4, 3)))


def test_vgg_distance(imgs, vgg_params):
    a, b = imgs
    d_same = vgg_distance(a, a, params=vgg_params)
    d_noisy = vgg_distance(a, b, params=vgg_params)
    d_diff = vgg_distance(a, np.flipud(a).copy(), params=vgg_params)
    assert d_same < 1e-10
    assert d_same < d_noisy < d_diff
