"""Dump per-op rows for one source-line filter from a fresh profile run."""
import gzip
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from profile_step import _build

h, w = int(sys.argv[1]), int(sys.argv[2])
srcfilter = sys.argv[3]
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

import jax

maxpool = cfg_kw.pop("maxpool", "first")
runner, params, consts, state = _build(h, w, maxpool, **cfg_kw)
state, losses = runner(params, consts, state, iters)
np.asarray(losses)
tmp = tempfile.mkdtemp(prefix="sttdump_")
with jax.profiler.trace(tmp):
    state, losses = runner(params, consts, state, iters)
    np.asarray(losses)

traces = list(Path(tmp).glob("plugins/profile/*/*.trace.json.gz"))
with gzip.open(traces[0], "rt") as f:
    data = json.load(f)
device_pids = {
    e["pid"] for e in data["traceEvents"]
    if e.get("ph") == "M" and e.get("name") == "process_name"
    and "TPU" in str(e.get("args", {}).get("name", ""))
}
rows = defaultdict(lambda: [0.0, 0, "", "", ""])
for e in data.get("traceEvents", []):
    if e.get("ph") != "X" or "dur" not in e or e.get("pid") not in device_pids:
        continue
    name = str(e.get("name", ""))
    if name.startswith("while") or "jit_" in name:
        continue
    args = e.get("args") or {}
    if "hlo_category" not in args and name.isdigit():
        continue
    src = str(args.get("source", "?"))
    if srcfilter not in src:
        continue
    r = rows[name]
    r[0] += e["dur"]
    r[1] += 1
    r[2] = args.get("hlo_category", "?")
    r[3] = args.get("shape_with_layout", "")[:100]
    r[4] = src
total = sum(r[0] for r in rows.values())
print(f"source filter '{srcfilter}': {total/iters/1000.0:.3f} ms/iter "
      f"across {len(rows)} distinct ops")
for name, (us, cnt, cat, shape, src) in sorted(
        rows.items(), key=lambda kv: -kv[1][0])[:40]:
    print(f"  {us/iters/1000.0:8.4f} ms/iter x{cnt:4d} [{cat}] {name[:44]} "
          f"{shape} {src.split('/')[-1]}")
