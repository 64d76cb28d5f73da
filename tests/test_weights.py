"""VGG weight store: determinism, npz round-trip, validation, torchvision
checkpoint conversion (OIHW -> HWIO)."""

import numpy as np
import pytest
import torch

from style_transfer_tpu.models import weights as W


def test_random_params_deterministic():
    a = W.random_params(0)
    b = W.random_params(0)
    c = W.random_params(1)
    np.testing.assert_array_equal(a["conv0_kernel"], b["conv0_kernel"])
    assert not np.array_equal(a["conv0_kernel"], c["conv0_kernel"])


def test_channel_table():
    assert W.CONV_CHANNELS[0] == (3, 64)
    assert W.CONV_CHANNELS[5] == (64, 128)
    assert W.CONV_CHANNELS[10] == (128, 256)
    assert W.CONV_CHANNELS[19] == (256, 512)
    assert W.CONV_CHANNELS[34] == (512, 512)
    assert len(W.CONV_INDICES) == 16  # VGG-19 has 16 convs in features


def test_npz_roundtrip(tmp_path):
    params = W.random_params(0)
    p = tmp_path / "w.npz"
    W.save_params(params, p)
    loaded = W.load_params(p)
    for k in params:
        np.testing.assert_array_equal(params[k], loaded[k])


def test_validation_rejects_bad_shapes(tmp_path):
    params = W.random_params(0)
    params["conv0_kernel"] = params["conv0_kernel"][:, :, :, :32]
    p = tmp_path / "bad.npz"
    np.savez(p, **params)
    with pytest.raises(ValueError, match="conv0"):
        W.load_params(p)


def test_convert_torchvision_checkpoint(tmp_path):
    """Build a fake torchvision-style state dict and convert it."""
    state = {}
    rng = np.random.RandomState(0)
    for idx in W.CONV_INDICES:
        cin, cout = W.CONV_CHANNELS[idx]
        state[f"features.{idx}.weight"] = torch.from_numpy(
            rng.randn(cout, cin, 3, 3).astype(np.float32)
        )
        state[f"features.{idx}.bias"] = torch.from_numpy(
            rng.randn(cout).astype(np.float32)
        )
    pth = tmp_path / "vgg19-fake.pth"
    torch.save(state, pth)
    out = tmp_path / "w.npz"
    params = W.convert_torchvision(pth, out)
    # OIHW -> HWIO
    w0 = state["features.0.weight"].numpy()
    np.testing.assert_array_equal(
        params["conv0_kernel"], np.transpose(w0, (2, 3, 1, 0))
    )
    assert out.is_file()
    loaded = W.load_params(out)
    np.testing.assert_array_equal(loaded["conv0_bias"], state["features.0.bias"])


def test_resolve_explicit_path(tmp_path):
    p = tmp_path / "w.npz"
    W.save_params(W.random_params(0), p)
    params, src = W.resolve_params(p)
    assert str(p) in src
    assert "conv0_kernel" in params


def test_resolve_random_fallback(monkeypatch, tmp_path):
    monkeypatch.delenv("STT_VGG19_NPZ", raising=False)
    monkeypatch.setattr(W, "_CACHE_PATH", tmp_path / "none.npz")
    monkeypatch.setattr(W, "_find_torch_hub_checkpoint", lambda: None)
    with pytest.warns(UserWarning, match="random"):
        params, src = W.resolve_params(None)
    assert src.startswith("random")
    with pytest.raises(FileNotFoundError):
        W.resolve_params(None, allow_random=False)
