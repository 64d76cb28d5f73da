"""Torch-semantics 2D image resize (bicubic a=-0.75 / bilinear, half-pixel
centers, border-replicated taps, no antialias).

The reference's cross-scale state carries go through ``F.interpolate``:
the iterate upsample at each pyramid crossing
(``/root/reference/style_transfer/style_transfer.py:418``) and the Adam
moment warm-start (``:285-295``, bicubic for ``exp_avg``, bilinear for
``exp_avg_sq``). ``jax.image.resize`` uses the Keys cubic kernel with
a=-0.5 (and antialiases on downsample), so its trajectories diverge from
the reference's at every scale crossing. This module reproduces torch's
sampling exactly.

TPU-first formulation: instead of gathers, each axis resize is a dense
(out, in) weight matrix built host-side (shapes are static per scale) and
applied as two einsum contractions — MXU work that runs once per crossing.
The matrices are tiny relative to a step (a 2048->2896 bicubic matrix is
~24 MB f32 and is folded into the jitted program as a constant).
"""

import functools

import numpy as np
from jax import lax
import jax.numpy as jnp

__all__ = ["resize2d"]


def _cubic_kernel(t, a=-0.75):
    """Cubic convolution kernel (Keys), torch's a=-0.75 flavor."""
    t = np.abs(t)
    t2, t3 = t * t, t * t * t
    w = np.where(
        t <= 1,
        (a + 2) * t3 - (a + 3) * t2 + 1,
        np.where(t < 2, a * t3 - 5 * a * t2 + 8 * a * t - 4 * a, 0.0),
    )
    return w


def _axis_matrix(n_in: int, n_out: int, method: str) -> np.ndarray:
    """(n_out, n_in) resampling matrix with torch align_corners=False
    semantics: src = scale * (dst + 0.5) - 0.5, out-of-range taps clamped
    to the border (replicate)."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    scale = n_in / n_out
    dst = np.arange(n_out, dtype=np.float64)
    src = scale * (dst + 0.5) - 0.5
    m = np.zeros((n_out, n_in), dtype=np.float64)
    rows = np.arange(n_out)
    if method == "bilinear":
        # torch clamps the (possibly negative) source index to 0 first.
        src = np.maximum(src, 0.0)
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        i0c = np.clip(i0, 0, n_in - 1)
        i1c = np.clip(i0 + 1, 0, n_in - 1)
        np.add.at(m, (rows, i0c), 1.0 - frac)
        np.add.at(m, (rows, i1c), frac)
    elif method == "bicubic":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for k in range(-1, 3):
            w = _cubic_kernel(frac - k)
            idx = np.clip(i0 + k, 0, n_in - 1)
            np.add.at(m, (rows, idx), w)
    else:
        raise ValueError("method must be 'bilinear' or 'bicubic'")
    return m.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _axis_matrix_cached(n_in, n_out, method):
    return _axis_matrix(n_in, n_out, method)


def resize2d(x, hw, method: str = "bicubic"):
    """Resize NHWC ``x`` to (h, w) with torch ``F.interpolate`` semantics.

    Precision is pinned HIGH: on TPU the default f32 matmul is single-pass
    bf16, which would inject ~1e-3 relative error into the resampled state
    (the same invariant as the statistics matmuls, see CLAUDE.md)."""
    h, w = hw
    n, ih, iw, c = x.shape
    rh = jnp.asarray(_axis_matrix_cached(ih, h, method))
    rw = jnp.asarray(_axis_matrix_cached(iw, w, method))
    x = jnp.einsum("oh,nhwc->nowc", rh, x, precision=lax.Precision.HIGH)
    x = jnp.einsum("ow,nhwc->nhoc", rw, x, precision=lax.Precision.HIGH)
    return x
