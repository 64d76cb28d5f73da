"""Golden-output regression (SURVEY.md §4.3): a committed output image for a
fixed tiny workload. Guards against silent objective/optimizer/feature
regressions — any semantic change to the pipeline shows up as a PSNR drop
against the committed artifact. Deterministic CPU runs reproduce the artifact
bit-exactly (PSNR inf, verified round 5), so the 45 dB bar absorbs only
float drift (XLA version reassociation), never semantic change.

Regenerate ONLY after an intentional semantic change, on CPU:
  python - <<'EOF'
  import sys; sys.path.insert(0, 'tests'); import conftest
  import numpy as np
  from PIL import Image
  from style_transfer_tpu.engine import StyleTransfer
  from style_transfer_tpu.models.weights import random_params
  h, w = 96, 128
  yy, xx = np.mgrid[0:h, 0:w]
  arr = np.stack([xx/w*255, yy/h*255, (xx+yy)/(h+w)*255], -1)
  content = Image.fromarray(arr.astype(np.uint8))
  style = Image.fromarray(
      np.random.RandomState(7).randint(0, 255, (80, 80, 3)).astype(np.uint8))
  st = StyleTransfer(devices=1, weights=random_params(0), callback_chunk=25)
  st.seed(0)
  st.stylize(content, [style], min_scale=64, end_scale=64,
             iterations=100, initial_iterations=100
             ).save('tests/golden/tiny_w2_64px.png')
  EOF
"""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from style_transfer_tpu.engine import StyleTransfer
from style_transfer_tpu.models.weights import random_params
from style_transfer_tpu.utils.metrics import psnr

GOLDEN = Path(__file__).parent / "golden" / "tiny_w2_64px.png"


@pytest.mark.slow
def test_golden_tiny_w2(content_pil, style_pil):
    st = StyleTransfer(devices=1, weights=random_params(0), callback_chunk=25)
    st.seed(0)
    img = st.stylize(
        content_pil, [style_pil], min_scale=64, end_scale=64,
        iterations=100, initial_iterations=100,
    )
    got = np.asarray(img, np.float64) / 255.0
    want = np.asarray(Image.open(GOLDEN), np.float64) / 255.0
    p = psnr(got, want)
    assert p > 45.0, f"output drifted from golden: PSNR {p:.2f} dB"
