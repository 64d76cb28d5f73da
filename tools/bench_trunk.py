"""Standalone TPU bench of the fused Pallas early trunk (ops/pallas/trunk.py).

Times forward and forward+backward of ``early_trunk_stats`` across kernel
variants (module constants POOL_BWD / CONV_IMPL and the tile size) in one
device attach. The gradient is *summed on device* — fetching the full image
gradient through the axon tunnel costs ~1.5 s and must not be timed
(CLAUDE.md quirk).

Usage: python tools/bench_trunk.py [H] [W]
    STT_TRUNK_VARIANTS='{"name": {"pool_bwd": "stored", "conv_impl": "ky3",
                                  "tile": 64}, ...}'  overrides the sweep.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H = int(sys.argv[1]) if len(sys.argv) > 1 else 2172
W = int(sys.argv[2]) if len(sys.argv) > 2 else 2896
REPS = 8

_env = os.environ.get("STT_TRUNK_VARIANTS")
VARIANTS = json.loads(_env) if _env else {
    "base(recompute,concat,64)": {},
    "stored-argmax": {"pool_bwd": "stored"},
    "ky3-conv": {"conv_impl": "ky3"},
    "tile128": {"tile": 128},
}


def main():
    # Probe for a live device out-of-process first: an in-process
    # jax.devices() can wedge at backend init for an hour on this
    # machine's axon tunnel (CLAUDE.md quirk).
    from __graft_entry__ import _probe_real_device_count

    if _probe_real_device_count(timeout=120) < 1:
        print("No real TPU device reachable (probe timed out); aborting.")
        sys.exit(1)

    import jax
    import jax.numpy as jnp

    from style_transfer_tpu.models.weights import resolve_params
    from style_transfer_tpu.ops.pallas import trunk
    from style_transfer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    params = resolve_params()
    key = jax.random.PRNGKey(0)
    image = jax.random.uniform(key, (1, H, W, 3), jnp.float32)
    image = jax.device_put(image)

    def timed(fn, *args):
        out = fn(*args)
        jax.tree.map(np.asarray, out)  # sync (block_until_ready lies on axon)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.tree.map(np.asarray, out)
            times.append((time.perf_counter() - t0) * 1000)
        return float(np.median(times)), out

    results = {}
    saved = (trunk.POOL_BWD, trunk.CONV_IMPL)
    for name, kw in VARIANTS.items():
        trunk.POOL_BWD = kw.get("pool_bwd", "recompute")
        trunk.CONV_IMPL = kw.get("conv_impl", "concat")
        tile = kw.get("tile", trunk.TILE)

        def fwd(img):
            cut, moments = trunk.early_trunk_stats(
                params, img, compute_dtype=jnp.bfloat16, tile=tile)
            return jnp.sum(cut.astype(jnp.float32)), moments

        def loss(img):
            cut, moments = trunk.early_trunk_stats(
                params, img, compute_dtype=jnp.bfloat16, tile=tile)
            t = jnp.sum(cut.astype(jnp.float32))
            for m in jax.tree.leaves(moments):
                t += jnp.sum(m.astype(jnp.float32))
            return t

        def fwd_bwd(img):
            val, grad = jax.value_and_grad(loss)(img)
            return val, jnp.sum(jnp.abs(grad))  # reduce grad on device

        # Separate try blocks: a Mosaic rejection that only affects the
        # backward kernel must not discard the measured forward timing.
        ms_f = None
        try:
            ms_f, _ = timed(jax.jit(fwd), image)
        except Exception as e:
            print(f"{name:28s} fwd FAILED: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        try:
            ms_fb, (val, gsum) = timed(jax.jit(fwd_bwd), image)
        except Exception as e:
            print(f"{name:28s} fwd {ms_f:7.2f} ms   fwd+bwd FAILED: "
                  f"{type(e).__name__}: {str(e)[:140]}", flush=True)
            results[name] = (ms_f, None)
            continue
        results[name] = (ms_f, ms_fb)
        print(f"{name:28s} fwd {ms_f:7.2f} ms   fwd+bwd {ms_fb:7.2f} ms   "
              f"loss={float(val):.3e} |g|={float(gsum):.3e}", flush=True)

    trunk.POOL_BWD, trunk.CONV_IMPL = saved
    base = next(iter(results.values()), None)
    if base:
        for name, (f, fb) in results.items():
            fb_s = f"x{base[1]/fb:5.2f}" if fb and base[1] else "  n/a"
            print(f"{name:28s} fwd x{base[0]/f:5.2f}   fwd+bwd {fb_s}")


if __name__ == "__main__":
    main()
