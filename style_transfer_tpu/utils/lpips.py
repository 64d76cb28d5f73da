"""LPIPS proper (Zhang et al. 2018), loadable from a local weight bundle.

BASELINE.md's north-star fidelity metric is **LPIPS < 0.02** against
reference outputs. LPIPS = learned linear combination of channel-unit-
normalized feature differences from a fixed ImageNet backbone (AlexNet by
default, VGG16 optionally). Both the backbone weights and the learned
linear head are downloads this machine cannot make (no egress), so:

* this module implements the full metric in JAX against a **local .npz
  bundle** (see below) and computes it whenever such a bundle is present;
* ``tools/port_lpips.py`` builds the bundle anywhere the torch checkpoints
  exist (torchvision backbone .pth + official LPIPS linear .pth);
* ``utils.metrics.perceptual_distance`` / ``tools/fidelity.py`` switch to
  real LPIPS automatically when a bundle resolves, and fall back to the
  uniform-weight VGG-distance proxy otherwise — labeled as such.

Bundle format (.npz):
  meta                      uint8 JSON: {"format": "stt-lpips", "version": 1,
                                         "net": "alex"|"vgg16"}
  conv{i}_kernel            HWIO f32 backbone conv kernels, i = 0..N-1 in
                            forward order (pool positions are implied by
                            ``net``)
  conv{i}_bias              (C_out,) f32
  lin{j}                    (C_j,) f32 nonneg learned head for tap j

The computation matches the reference implementation of LPIPS
(richzhang/PerceptualSimilarity, spatial_average=True, normalize inputs
from [0,1]): scaling layer -> backbone relu taps -> channel-unit
normalization (eps 1e-10) -> squared diff -> 1x1 learned head -> spatial
mean -> sum over taps. ``tests/test_metrics.py`` cross-checks this formula
against an independent torch implementation on random weights.
"""

import json
import os
from pathlib import Path

import numpy as np

__all__ = ["load_bundle", "find_bundle", "lpips", "LPIPS_NETS"]

# Backbone architectures: (out_channels, kernel, stride, pad,
# pool_before: bool). Taps are taken after each entry marked tap=True.
# AlexNet per torchvision .features; VGG16 taps at relu{1_2,2_2,3_3,4_3,5_3}.
LPIPS_NETS = {
    "alex": [
        # (cout, k, stride, pad, pool_before, tap)
        (64, 11, 4, 2, False, True),
        (192, 5, 1, 2, True, True),
        (384, 3, 1, 1, True, True),
        (256, 3, 1, 1, False, True),
        (256, 3, 1, 1, False, True),
    ],
    "vgg16": [
        (64, 3, 1, 1, False, False),
        (64, 3, 1, 1, False, True),
        (128, 3, 1, 1, True, False),
        (128, 3, 1, 1, False, True),
        (256, 3, 1, 1, True, False),
        (256, 3, 1, 1, False, False),
        (256, 3, 1, 1, False, True),
        (512, 3, 1, 1, True, False),
        (512, 3, 1, 1, False, False),
        (512, 3, 1, 1, False, True),
        (512, 3, 1, 1, True, False),
        (512, 3, 1, 1, False, False),
        (512, 3, 1, 1, False, True),
    ],
}

# LPIPS ScalingLayer constants (richzhang/PerceptualSimilarity lpips.py):
# applied to inputs already mapped [0,1] -> [-1,1].
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_ENV_VAR = "STT_LPIPS_WEIGHTS"


def _default_search_paths():
    here = Path(__file__).resolve().parents[2]
    cache = Path(os.path.expanduser("~/.cache/style_transfer_tpu"))
    names = ["lpips_alex.npz", "lpips_vgg16.npz", "lpips.npz"]
    for base in (here / "weights", cache):
        for n in names:
            yield base / n


def find_bundle(path=None):
    """Resolve an LPIPS bundle path: explicit arg > $STT_LPIPS_WEIGHTS >
    default locations (repo ./weights/, ~/.cache/style_transfer_tpu/).
    Returns a Path or None."""
    if path is not None:
        p = Path(path)
        return p if p.is_file() else None
    env = os.environ.get(_ENV_VAR)
    if env:
        p = Path(env)
        if p.is_file():
            return p
    for cand in _default_search_paths():
        if cand.is_file():
            return cand
    return None


def load_bundle(path):
    """Load and validate an LPIPS .npz bundle -> dict with 'net', 'convs'
    [(kernel, bias), ...], 'lins' [(C,) ...]."""
    with np.load(path) as f:
        arrays = {k: f[k] for k in f.files}
    meta = json.loads(bytes(arrays.pop("meta")).decode())
    if meta.get("format") != "stt-lpips" or meta.get("version") != 1:
        raise ValueError(f"{path}: not a stt-lpips v1 bundle")
    net = meta["net"]
    if net not in LPIPS_NETS:
        raise ValueError(f"{path}: unknown net {net!r}")
    spec = LPIPS_NETS[net]
    convs, cin = [], 3
    for i, (cout, k, _s, _p, _pool, _tap) in enumerate(spec):
        kern = np.asarray(arrays[f"conv{i}_kernel"], np.float32)
        bias = np.asarray(arrays[f"conv{i}_bias"], np.float32)
        if kern.shape != (k, k, cin, cout) or bias.shape != (cout,):
            raise ValueError(
                f"{path}: conv{i} shape {kern.shape} != {(k, k, cin, cout)}")
        convs.append((kern, bias))
        cin = cout
    lins = []
    taps = [e for e in spec if e[5]]
    for j, entry in enumerate(taps):
        lin = np.asarray(arrays[f"lin{j}"], np.float32)
        if lin.shape != (entry[0],):
            raise ValueError(f"{path}: lin{j} shape {lin.shape} != "
                             f"({entry[0]},)")
        lins.append(lin)
    return {"net": net, "convs": convs, "lins": lins, "path": str(path)}


def _features(bundle, x):
    """Backbone relu-tap features of a (1, H, W, 3) [-1,1]-scaled input."""
    import jax.numpy as jnp
    from jax import lax

    spec = LPIPS_NETS[bundle["net"]]
    out = []
    for (cout, k, stride, pad, pool_before, tap), (kern, bias) in zip(
            spec, bundle["convs"]):
        if pool_before:
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                "VALID")  # torch MaxPool2d(3, 2): no padding, floor mode
        x = lax.conv_general_dilated(
            x, jnp.asarray(kern), (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(bias)
        x = jnp.maximum(x, 0.0)
        if tap:
            out.append(x)
    return out


def lpips(a, b, bundle) -> float:
    """LPIPS distance between two HWC float arrays in [0, 1]."""
    import jax.numpy as jnp

    if isinstance(bundle, (str, Path)):
        bundle = load_bundle(bundle)
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")

    def prep(x):
        x = x * 2.0 - 1.0  # [0,1] -> [-1,1] (LPIPS normalize=True)
        x = (x - _SHIFT) / _SCALE
        return jnp.asarray(x[None])

    fa = _features(bundle, prep(a))
    fb = _features(bundle, prep(b))
    total = 0.0
    for x, y, lin in zip(fa, fb, bundle["lins"]):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        # normalize_tensor: f / (||f||_c + 1e-10)
        xn = x / (np.sqrt((x ** 2).sum(-1, keepdims=True)) + 1e-10)
        yn = y / (np.sqrt((y ** 2).sum(-1, keepdims=True)) + 1e-10)
        d = (xn - yn) ** 2
        total += float((d * np.asarray(lin, np.float64)).sum(-1).mean())
    return total
