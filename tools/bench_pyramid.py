"""Timed full-pyramid run (the reference's headline workload).

Usage: python tools/bench_pyramid.py [END_SCALE=2896] [--cold]
Builds a synthetic content/style pair at the reference aspect (2896x2172,
README.md:69), runs the default pyramid (min_scale 128, 1000 initial +
500/scale iterations) on the engine's defaults, and prints per-scale and
total wall times. Warm-cache runs skip XLA compiles entirely.
"""

import sys
import time
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    end_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 2896

    from style_transfer_tpu.engine import StyleTransfer

    rng = np.random.RandomState(0)
    content = Image.fromarray(
        (rng.rand(2172, 2896, 3) * 255).astype(np.uint8))
    style = Image.fromarray((rng.rand(512, 512, 3) * 255).astype(np.uint8))

    st = StyleTransfer(devices=1)
    st.seed(0)

    t_scale = {}
    last = [None, time.perf_counter()]

    def cb(it):
        key = (it.w, it.h)
        if key != last[0]:
            now = time.perf_counter()
            if last[0] is not None:
                t_scale[last[0]] = t_scale.get(last[0], 0.0) + (now - last[1])
            last[0], last[1] = key, now

    t0 = time.perf_counter()
    st.stylize(content, [style], end_scale=end_scale, callback=cb)
    total = time.perf_counter() - t0
    now = time.perf_counter()
    if last[0] is not None:
        t_scale[last[0]] = t_scale.get(last[0], 0.0) + (now - last[1])
    for k, v in t_scale.items():
        print(f"scale {k[0]}x{k[1]}: {v:.1f}s")
    print(f"TOTAL pyramid to {end_scale}: {total:.1f}s")


if __name__ == "__main__":
    main()
