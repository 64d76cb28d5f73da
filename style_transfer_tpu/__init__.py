"""style_transfer_tpu: TPU-native optimization-based neural style transfer.

A ground-up JAX/XLA/Pallas rebuild with the full capability surface of
crowsonkb/style-transfer-pytorch (reference mounted at /root/reference):
multi-scale W2/Gram style optimization over frozen VGG-19 features, fused
single-program iteration steps, SPMD spatial sharding across TPU meshes,
color-managed image I/O, CLI, and live web preview.
"""

from pathlib import Path

srgb_profile = (Path(__file__).resolve().parent / "srgb.icc").read_bytes()

from .engine import StyleTransfer  # noqa: E402
from .utils.trace import STIterate, TraceRecorder  # noqa: E402
from .web.server import WebInterface  # noqa: E402

__version__ = "0.1.0"
__all__ = ["StyleTransfer", "STIterate", "TraceRecorder", "WebInterface", "srgb_profile"]
