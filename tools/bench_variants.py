"""A/B bench of StepConfig variants on the real TPU at a given size.

Usage: python tools/bench_variants.py [H] [W] -- then edit VARIANTS below.
Prints ms/iter per variant (median of chunks).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
CHUNK = 50
ROUNDS = 3

import json
import os

# Override via STT_VARIANTS='{"name": {"maxpool_impl": "xla", ...}, ...}'
_env = os.environ.get("STT_VARIANTS")
VARIANTS = json.loads(_env) if _env else {
    "base(cast0,paired)": dict(maxpool_impl="paired", cast_layer=0),
    "cast1,paired": dict(maxpool_impl="paired", cast_layer=1),
    "cast5,paired": dict(maxpool_impl="paired", cast_layer=5),
    "cast1,xla": dict(maxpool_impl="xla", cast_layer=1),
}
CHUNK = int(os.environ.get("STT_CHUNK", CHUNK))


def main():
    import __graft_entry__ as g
    from style_transfer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    results = {}
    for name, kw in VARIANTS.items():
        kw = dict(kw)
        kw.setdefault("sqrtm_impl", "xla")  # engine 'auto' resolution (r3)
        kw["im2col_layers"] = tuple(kw.get("im2col_layers", ()))
        runner, params, consts, state = g._build(
            n_h=H, n_w=W, compute_dtype="bfloat16", **kw
        )
        state, losses = runner(params, consts, state, CHUNK)
        np.asarray(losses)  # sync after compile+warmup
        times = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            state, losses = runner(params, consts, state, CHUNK)
            np.asarray(losses)
            times.append((time.perf_counter() - t0) / CHUNK * 1000)
        ms = float(np.median(times))
        results[name] = ms
        print(f"{name:28s} {ms:7.3f} ms/iter  ({1000/ms:6.1f} it/s)  "
              f"loss[-1]={float(np.asarray(losses)[-1]):.4f}", flush=True)
    base = next(iter(results.values()), None)
    if base:
        for name, ms in results.items():
            print(f"{name:28s} speedup vs base: {base/ms:6.3f}x")


if __name__ == "__main__":
    main()
