"""Image fidelity metrics: PSNR, SSIM, LPIPS, and VGG feature distance.

BASELINE.md tracks LPIPS/PSNR of this framework's outputs against reference
outputs. LPIPS proper needs learned weights (a download): when a local
bundle resolves (see ``utils/lpips.py``), :func:`perceptual_distance`
computes the real metric; otherwise it falls back to ``vgg_distance`` — the
same construction (unit-normalized VGG feature differences averaged over
layers) with uniform layer weighting, the standard offline proxy — and says
so. All functions take HWC float arrays in [0, 1].
"""

import numpy as np

__all__ = ["psnr", "ssim", "vgg_distance", "perceptual_distance"]


def _check(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    return a, b


def psnr(a, b, data_range: float = 1.0) -> float:
    a, b = _check(a, b)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def _gaussian_kernel(size=11, sigma=1.5):
    ax = np.arange(size) - size // 2
    k = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k /= k.sum()
    return k


def _filter2d_sep(img, k):
    """Separable 2D filter along H and W of an HWC array ('valid' crop)."""
    pad = len(k) // 2
    out = img
    out = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 0, out)
    out = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, out)
    return out[pad:-pad, pad:-pad]


def ssim(a, b, data_range: float = 1.0) -> float:
    """Mean SSIM (Wang et al. 2004), 11x11 Gaussian window, per channel."""
    a, b = _check(a, b)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    k = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for c in range(a.shape[2]):
        x, y = a[..., c], b[..., c]
        mx = _filter2d_sep(x, k)
        my = _filter2d_sep(y, k)
        mxx = _filter2d_sep(x * x, k)
        myy = _filter2d_sep(y * y, k)
        mxy = _filter2d_sep(x * y, k)
        vx = mxx - mx ** 2
        vy = myy - my ** 2
        cov = mxy - mx * my
        s = ((2 * mx * my + c1) * (2 * cov + c2)) / (
            (mx ** 2 + my ** 2 + c1) * (vx + vy + c2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


def vgg_distance(a, b, params=None, layers=(1, 6, 11, 20, 29)) -> float:
    """LPIPS-style perceptual distance: mean squared difference of channel-
    unit-normalized VGG features, averaged over layers (uniform weights)."""
    import jax.numpy as jnp

    from ..models.vgg import extract_features
    from ..models.weights import resolve_params

    if params is None:
        params, _ = resolve_params(None)
        params = {k: jnp.asarray(v) for k, v in params.items()}
    a, b = _check(a, b)
    fa = extract_features(params, jnp.asarray(a[None], jnp.float32), layers)
    fb = extract_features(params, jnp.asarray(b[None], jnp.float32), layers)
    total = 0.0
    for l in layers:
        x = np.asarray(fa[l], np.float64)
        y = np.asarray(fb[l], np.float64)
        xn = x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)
        yn = y / (np.linalg.norm(y, axis=-1, keepdims=True) + 1e-10)
        total += np.mean((xn - yn) ** 2)
    return float(total / len(layers))


def perceptual_distance(a, b, params=None, lpips_weights=None):
    """(value, kind): real LPIPS when a weight bundle resolves (explicit
    path > $STT_LPIPS_WEIGHTS > default locations — utils/lpips.py), else
    the uniform-weight VGG-distance proxy. ``kind`` is ``"lpips-<net>"`` or
    ``"vgg_distance_proxy"`` so reports never pass a proxy off as LPIPS."""
    from . import lpips as lpips_mod

    bundle_path = lpips_mod.find_bundle(lpips_weights)
    if bundle_path is not None:
        bundle = lpips_mod.load_bundle(bundle_path)
        return lpips_mod.lpips(a, b, bundle), f"lpips-{bundle['net']}"
    return vgg_distance(a, b, params=params), "vgg_distance_proxy"
