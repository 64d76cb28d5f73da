"""Per-op TPU profile of the fused step at a given size.

Usage: python tools/profile_step.py [H] [W] [maxpool_impl] [chunks] [k=v ...]
Trailing k=v pairs are StepConfig overrides (e.g. n_bands=12
im2col_layers=0,10,28). Parses the vm.trace.json.gz the axon profiler writes
and buckets device op durations. See PERF.md for the history of these numbers.

``profile()`` is importable so a long-lived session (one axon attach) can
profile many configs; ``time_step()`` is the cheap timing-only variant.
"""

import gzip
import json
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _build(h, w, maxpool, **cfg_kw):
    import __graft_entry__ as g
    from style_transfer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    cfg_kw.setdefault("compute_dtype", "bfloat16")
    cfg_kw.setdefault("sqrtm_impl", "xla")
    return g._build(n_h=h, n_w=w, maxpool_impl=maxpool, **cfg_kw)


def time_step(h, w, maxpool="auto", iters=20, reps=3, **cfg_kw):
    """Wall-time ms/iter of the fused step (no profiler)."""
    runner, params, consts, state = _build(h, w, maxpool, **cfg_kw)
    state, losses = runner(params, consts, state, iters)
    np.asarray(losses)  # sync (block_until_ready can return early over axon)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, losses = runner(params, consts, state, iters)
        np.asarray(losses)
        best = min(best, (time.perf_counter() - t0) / iters * 1000.0)
    print(f"[time_step] {h}x{w} maxpool={maxpool} {cfg_kw}: "
          f"{best:.2f} ms/iter", flush=True)
    return best


def profile(h, w, maxpool="auto", iters=20, top=30, **cfg_kw):
    """Run the step under jax.profiler.trace and print per-op buckets."""
    import jax

    runner, params, consts, state = _build(h, w, maxpool, **cfg_kw)
    state, losses = runner(params, consts, state, iters)
    np.asarray(losses)  # sync

    tmp = tempfile.mkdtemp(prefix="sttprof_")
    with jax.profiler.trace(tmp):
        state, losses = runner(params, consts, state, iters)
        np.asarray(losses)

    traces = list(Path(tmp).glob("plugins/profile/*/*.trace.json.gz"))
    assert traces, f"no trace under {tmp}"
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

    # Device pid from process metadata
    device_pids = {
        e["pid"]
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    events = [
        e for e in data.get("traceEvents", [])
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in device_pids
        and not str(e.get("name", "")).startswith("while")  # container op
        and "jit_" not in str(e.get("name", ""))
        # Whole-trace container rows (a bare step-number name, no HLO
        # category/source) span every real op and double the totals.
        and ("hlo_category" in (e.get("args") or {})
             or not str(e.get("name", "")).isdigit())
    ]
    buckets = defaultdict(float)
    names = defaultdict(float)
    sources = defaultdict(float)
    flops = defaultdict(float)
    total = 0.0
    for e in events:
        args = e.get("args", {})
        cat = args.get("hlo_category", "uncategorized")
        src = args.get("source", "?")
        dur = e["dur"]  # microseconds
        buckets[cat] += dur
        key = f"{e.get('name','')[:40]} [{cat}] {args.get('shape_with_layout','')[:48]}"
        names[key] += dur
        sources[src] += dur
        flops[key] += float(args.get("model_flops", 0) or 0)
        total += dur

    per_iter = total / iters / 1000.0
    print(f"\n=== {h}x{w} maxpool={maxpool} {cfg_kw} {iters} iters: "
          f"{per_iter:.2f} ms/iter total device-op time ===", flush=True)
    for cat, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{cat:32s} {us/iters/1000.0:8.3f} ms/iter ({100*us/total:5.1f}%)")
    print(f"\nTop {top} ops (TF/s = model flops / device time):")
    for name, us in sorted(names.items(), key=lambda kv: -kv[1])[:top]:
        tf = flops[name] / (us * 1e6) if us else 0.0
        print(f"  {us/iters/1000.0:8.3f} ms/iter {tf:6.1f} TF/s  {name}")
    print("\nTop 15 sources:")
    for src, us in sorted(sources.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {us/iters/1000.0:8.3f} ms/iter  {src}")
    sys.stdout.flush()
    return per_iter


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    maxpool = sys.argv[3] if len(sys.argv) > 3 else "auto"
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    cfg_kw = {}
    for kv in sys.argv[5:]:
        k, v = kv.split("=", 1)
        if "," in v:
            cfg_kw[k] = tuple(int(x) for x in v.split(",") if x)
        elif v in ("True", "False"):
            cfg_kw[k] = v == "True"
        else:
            try:
                cfg_kw[k] = int(v)
            except ValueError:
                cfg_kw[k] = v
    profile(h, w, maxpool, iters, **cfg_kw)


if __name__ == "__main__":
    main()
