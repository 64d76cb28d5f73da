"""Timed full-pyramid run (the reference's headline workload) -> one JSON line.

Usage: python tools/bench_pyramid.py [END_SCALE=2896] [--label warm|cold]
                                     [--out PYRAMID_rNN.json]

Builds a synthetic content/style pair at the reference aspect (2896x2172,
/root/reference/README.md:69 — "15 minutes on an RTX 3090"), runs the
default pyramid (min_scale 128, 1000 initial + 500/scale iterations) on the
engine's defaults, and prints ONE JSON line on stdout:

  {"metric": "pyramid_wall", "value": <total s>, "unit": "s",
   "end_scale": N, "label": "warm", "iter_wall": s, "overhead_wall": s,
   "scales": {"WxH": {"wall": s, "iters": n, "ms_per_iter": m}, ...}}

``iter_wall`` sums the in-scale optimization time (first-callback to last
per scale); ``overhead_wall`` = total - iter_wall is everything else:
target captures, compiles/prefetch waits, resizes, image fetches. Human-
readable per-scale lines go to stderr. Tracked per round as
PYRAMID_r{N}.json (VERDICT r3 #3: the 512px microbench alone cannot catch
a regression of the 15-minute-beating workload).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    args = [a for a in sys.argv[1:]]
    label = "unlabeled"
    out_path = None
    if "--label" in args:
        i = args.index("--label")
        label = args[i + 1]
        del args[i:i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i:i + 2]
    end_scale = int(args[0]) if args else 2896

    # The remote-TPU attach can WEDGE for many minutes at the first device
    # touch (PERF.md "session-attach stall"; three consecutive runs this
    # round ate 226/1282/435 s of it). Probe in disposable subprocesses
    # until one attaches fast — the wedge is remote-side state that often
    # clears between probes — so the timed run below starts healthy.
    from __graft_entry__ import _probe_real_device_count

    deadline = time.monotonic() + 1200.0
    attempt = 0
    while True:
        attempt += 1
        if _probe_real_device_count(timeout=240.0) > 0:
            break
        if time.monotonic() >= deadline:
            print(f"bench_pyramid: no healthy attach after {attempt} probes; "
                  "proceeding anyway", file=sys.stderr)
            break
        print(f"bench_pyramid: attach probe {attempt} failed; retrying",
              file=sys.stderr)
        time.sleep(30.0)

    from style_transfer_tpu.engine import StyleTransfer, phase_totals

    rng = np.random.RandomState(0)
    content = Image.fromarray(
        (rng.rand(2172, 2896, 3) * 255).astype(np.uint8))
    style = Image.fromarray((rng.rand(512, 512, 3) * 255).astype(np.uint8))

    st = StyleTransfer(devices=1)
    st.seed(0)

    # Per-scale iteration wall from the engine's STIterate.time stamps
    # (chunk-interpolated), NOT callback wall-clock: callbacks burst at
    # chunk boundaries, so wall-clock at the first callback of a scale is
    # really the END of that scale's first chunk — attributing from it
    # rolled every inter-scale gap (target captures, gated program-load
    # drains, warm-start resizes) plus the next scale's first chunk into
    # the PREVIOUS scale's wall (the r5-try1 JSON showed big scales 15-20%
    # "slower" than their measured per-chunk rate for exactly this reason).
    # it.time spans cover iteration dispatch + inter-chunk host work only.
    scales = {}
    cur = [None, None, 0, None]  # key, first-iterate time, iters, last time

    def flush():
        if cur[0] is not None:
            key = f"{cur[0][0]}x{cur[0][1]}"
            wall = cur[3] - cur[1]
            n = cur[2]
            scales[key] = {
                "wall": round(wall, 2),
                "iters": n,
                "ms_per_iter": round(wall / max(n - 1, 1) * 1000, 2),
            }

    def cb(it):
        key = (it.w, it.h)
        if key != cur[0]:
            flush()
            cur[0], cur[1], cur[2] = key, it.time, 1
        else:
            cur[2] += 1
        cur[3] = it.time

    phase_totals(reset=True)
    t0 = time.perf_counter()
    st.stylize(content, [style], end_scale=end_scale, callback=cb)
    total = time.perf_counter() - t0
    flush()

    # Attribute the run's wall to engine phases, grouped by family
    # ("targets@512" and "targets@2896" both land in "targets"; "chunk"/
    # "chunk1" cover the dispatch+fetch of the iteration chunks and should
    # track iter_wall). Indented names are nested detail rows inside a
    # parent phase — skip them or they'd double-count the family. What no
    # phase covers is "untimed": startup/attach and inter-phase gaps.
    phases = {}
    for name, secs in phase_totals().items():
        if name.startswith(" "):
            continue
        fam = name.split("@")[0]
        phases[fam] = round(phases.get(fam, 0.0) + secs, 2)

    iter_wall = sum(s["wall"] for s in scales.values())
    for k, v in scales.items():
        print(f"scale {k}: {v['wall']:.1f}s ({v['iters']} iters, "
              f"{v['ms_per_iter']:.1f} ms/iter)", file=sys.stderr)
    print(f"TOTAL pyramid to {end_scale}: {total:.1f}s "
          f"(in-scale {iter_wall:.1f}s, overhead {total - iter_wall:.1f}s)",
          file=sys.stderr)
    ph = ", ".join(f"{k} {v:.1f}s" for k, v in
                   sorted(phases.items(), key=lambda kv: -kv[1]))
    print(f"phases: {ph}; untimed {total - sum(phases.values()):.1f}s",
          file=sys.stderr)
    record = {
        "metric": "pyramid_wall",
        "value": round(total, 2),
        "unit": "s",
        "end_scale": end_scale,
        "label": label,
        "iter_wall": round(iter_wall, 2),
        "overhead_wall": round(total - iter_wall, 2),
        "phases": phases,
        "untimed": round(total - sum(phases.values()), 2),
        "scales": scales,
    }
    line = json.dumps(record)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n")


if __name__ == "__main__":
    main()
