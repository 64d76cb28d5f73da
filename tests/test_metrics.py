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


# ---------------------------------------------------------------- LPIPS


def _random_bundle(tmp_path, net="alex", seed=0):
    """Write a random-weight LPIPS bundle (valid format, nonneg head)."""
    import json

    from style_transfer_tpu.utils.lpips import LPIPS_NETS

    rng = np.random.RandomState(seed)
    spec = LPIPS_NETS[net]
    arrays = {}
    cin = 3
    j = 0
    for i, (cout, k, _s, _p, _pool, tap) in enumerate(spec):
        arrays[f"conv{i}_kernel"] = (
            rng.randn(k, k, cin, cout) * (1.5 / np.sqrt(k * k * cin))
        ).astype(np.float32)
        arrays[f"conv{i}_bias"] = (rng.randn(cout) * 0.05).astype(np.float32)
        if tap:
            arrays[f"lin{j}"] = rng.rand(cout).astype(np.float32)
            j += 1
        cin = cout
    arrays["meta"] = np.frombuffer(
        json.dumps({"format": "stt-lpips", "version": 1, "net": net}).encode(),
        dtype=np.uint8)
    path = tmp_path / f"lpips_{net}.npz"
    with open(path, "wb") as f:
        np.savez(f, **arrays)
    return path


def _torch_lpips_oracle(a, b, bundle):
    """Independent torch implementation of the LPIPS formula (scaling layer,
    backbone relu taps, channel-unit normalization, learned 1x1 head,
    spatial average, sum over taps) for cross-checking utils/lpips.py."""
    import torch

    from style_transfer_tpu.utils.lpips import LPIPS_NETS

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = torch.as_tensor(x, dtype=torch.float32).permute(2, 0, 1)[None]
        x = (x * 2 - 1 - shift) / scale
        out = []
        for (cout, k, stride, pad, pool, tap), (kern, bias) in zip(
                LPIPS_NETS[bundle["net"]], bundle["convs"]):
            if pool:
                x = torch.nn.functional.max_pool2d(x, 3, 2)
            w = torch.as_tensor(kern).permute(3, 2, 0, 1)  # HWIO -> OIHW
            x = torch.nn.functional.conv2d(
                x, w, torch.as_tensor(bias), stride=stride, padding=pad)
            x = torch.relu(x)
            if tap:
                out.append(x)
        return out

    total = 0.0
    for x, y, lin in zip(feats(a), feats(b), bundle["lins"]):
        xn = x / (x.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        yn = y / (y.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (xn - yn).pow(2)
        w = torch.as_tensor(lin).view(1, -1, 1, 1)
        total += float((d * w).sum(1).mean())
    return total


@pytest.mark.parametrize("net", ["alex", "vgg16"])
def test_lpips_matches_torch_oracle(tmp_path, net):
    from style_transfer_tpu.utils.lpips import load_bundle, lpips

    bundle = load_bundle(_random_bundle(tmp_path, net))
    rng = np.random.RandomState(1)
    a = rng.rand(64, 64, 3)
    b = np.clip(a + rng.randn(64, 64, 3) * 0.1, 0, 1)
    got = lpips(a, b, bundle)
    want = _torch_lpips_oracle(a, b, bundle)
    assert got == pytest.approx(want, rel=2e-4, abs=1e-7)
    assert lpips(a, a, bundle) == pytest.approx(0.0, abs=1e-12)
    assert got > 0


def test_lpips_rejects_bad_bundle(tmp_path):
    from style_transfer_tpu.utils.lpips import load_bundle

    p = tmp_path / "bad.npz"
    np.savez(p, meta=np.frombuffer(b'{"format":"x"}', dtype=np.uint8))
    with pytest.raises(ValueError):
        load_bundle(p)


def test_perceptual_distance_switches(tmp_path, vgg_params, monkeypatch):
    """perceptual_distance reports real LPIPS iff a bundle resolves
    (explicit path or $STT_LPIPS_WEIGHTS), the labeled proxy otherwise."""
    from style_transfer_tpu.utils.metrics import perceptual_distance

    rng = np.random.RandomState(2)
    a = rng.rand(64, 64, 3)
    b = np.clip(a + rng.randn(64, 64, 3) * 0.1, 0, 1)

    monkeypatch.delenv("STT_LPIPS_WEIGHTS", raising=False)
    d0, kind0 = perceptual_distance(a, b, params=vgg_params)
    assert kind0 == "vgg_distance_proxy"

    path = _random_bundle(tmp_path)
    d1, kind1 = perceptual_distance(a, b, lpips_weights=str(path))
    assert kind1 == "lpips-alex" and d1 > 0

    monkeypatch.setenv("STT_LPIPS_WEIGHTS", str(path))
    d2, kind2 = perceptual_distance(a, b)
    assert kind2 == "lpips-alex"
    assert d2 == pytest.approx(d1)
