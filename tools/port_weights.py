#!/usr/bin/env python
"""One-time conversion of a torchvision VGG-19 checkpoint to the native
.npz weight format (HWIO kernels, f32).

Usage:
    python tools/port_weights.py /path/to/vgg19-dcbb9e9d.pth [out.npz]

With no output path, writes to the default cache location the engine
resolves automatically (~/.cache/style_transfer_tpu/vgg19.npz).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from style_transfer_tpu.models.weights import _CACHE_PATH, convert_torchvision


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    src = Path(sys.argv[1])
    dst = Path(sys.argv[2]) if len(sys.argv) > 2 else _CACHE_PATH
    convert_torchvision(src, dst)
    print(f"Wrote {dst}")


if __name__ == "__main__":
    main()
