"""ops/resize.py: torch-interpolate-exact resampling (the reference's scale
crossings, ref style_transfer.py:285-295, :418)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from style_transfer_tpu.ops.resize import resize2d


@pytest.mark.parametrize("method,mode", [("bicubic", "bicubic"),
                                         ("bilinear", "bilinear")])
@pytest.mark.parametrize("src,dst", [
    ((17, 23), (24, 33)),    # ~sqrt(2) upsample (the pyramid crossing)
    ((24, 32), (48, 64)),    # 2x upsample
    ((33, 47), (16, 23)),    # downsample (no antialias in torch either)
    ((16, 16), (16, 16)),    # identity
    ((5, 7), (31, 41)),      # large factor, border-tap heavy
])
def test_matches_torch_interpolate(method, mode, src, dst):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *src, 3).astype(np.float32)
    ours = np.asarray(resize2d(x, dst, method))
    theirs = (
        F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                      dst, mode=mode)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


def test_identity_is_exact():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 9, 11, 3).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(resize2d(x, (9, 11), "bicubic")), x)
