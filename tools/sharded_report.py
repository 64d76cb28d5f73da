"""Characterize the sharded (mesh) step's communication at print sizes.

Compiles the fused step for an N-device spatial mesh on VIRTUAL CPU devices
(no pod needed — same GSPMD partitioning decisions as TPU for the SPMD pass)
and reports every cross-chip transfer: collective-permute strip shapes and
total bytes/iteration, all-reduce payloads, and an ICI-time projection for
v5e (VERDICT r2 next-step #3: the sharded path's behavior at print sizes had
never been characterized).

Usage: python tools/sharded_report.py [H] [W] [n_devices] [k=v ...]
"""

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2}

# v5e ICI: ~400 GB/s bidirectional per chip (2 links x ~100 GB/s each way).
_ICI_GBPS = 100e9


def _shape_bytes(shape_str):
    """'bf16[1,272,1448,64]{...}' -> payload bytes."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0, shape_str
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4), f"{dt}[{dims}]"


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2896
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 2172
    n_dev = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cfg_kw = {}
    for kv in sys.argv[4:]:
        k, v = kv.split("=", 1)
        if "," in v or k == "im2col_layers":
            cfg_kw[k] = tuple(int(x) for x in v.split(",") if x)
        else:
            try:
                cfg_kw[k] = int(v)
            except ValueError:
                cfg_kw[k] = v

    flags = os.environ.get("XLA_FLAGS", "")
    if f"device_count={n_dev}" not in flags:
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_dev}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import __graft_entry__ as g
    from style_transfer_tpu.parallel.mesh import make_mesh, shard_image

    mesh = make_mesh(jax.devices()[:n_dev])
    print(f"mesh: {dict(mesh.shape)} over {n_dev} virtual CPU devices")
    cfg_kw.setdefault("compute_dtype", "bfloat16")
    cfg_kw.setdefault("maxpool_impl", "auto")
    cfg_kw.setdefault("im2col_layers", (10, 19, 28) if h * w <= 4_000_000
                      else (10, 28))
    runner, params, consts, state = g._build(n_h=h, n_w=w, mesh=mesh, **cfg_kw)
    state = state._replace(
        image=shard_image(state.image, mesh),
        opt=state.opt._replace(mu=shard_image(state.opt.mu, mesh),
                               nu=shard_image(state.opt.nu, mesh)),
        ema=state.ema._replace(value=shard_image(state.ema.value, mesh)),
    )
    n_steps = 1  # per-iteration comms: one scan body
    text = runner.lower(params, consts, state, n_steps).compile().as_text()

    ags = {}
    for line in text.splitlines():
        m = re.match(r"\s*%?\S+ = (\S+\[[\d,]*\][^ ]*) all-gather\(",
                     line)
        if m:
            b, s = _shape_bytes(m.group(1))
            ags[s] = (ags.get(s, (0, 0))[0] + 1, b)
    if ags:
        print("\n!! ALL-GATHERS present:")
        for s, (c, b) in sorted(ags.items(),
                                key=lambda kv: -kv[1][0] * kv[1][1]):
            print(f"  {c:3d} x {b / 1e6:8.3f} MB  {s}")

    cps, ars = {}, {}
    for line in text.splitlines():
        line = line.strip()
        m = re.match(r"%?\S+ = (\S+\[[\d,]*\][^ ]*) collective-permute\(", line)
        if m:
            b, s = _shape_bytes(m.group(1))
            k = s
            cps[k] = (cps.get(k, (0, 0))[0] + 1, b)
        m = re.match(r"%?\S+ = (\S+\[[\d,]*\][^ ]*) all-reduce", line)
        if m:
            b, s = _shape_bytes(m.group(1))
            ars[s] = (ars.get(s, (0, 0))[0] + 1, b)
        # Tuple-result all-reduces: "(f32[64,64], f32[64]) all-reduce(..."
        m = re.match(r"%?\S+ = \(([^)]*)\) all-reduce", line)
        if m:
            for part in m.group(1).split(", "):
                b, s = _shape_bytes(part)
                if b:
                    ars[s] = (ars.get(s, (0, 0))[0] + 1, b)

    cp_total = sum(c * b for c, b in cps.values())
    ar_total = sum(c * b for c, b in ars.values())
    print(f"\ncollective-permutes ({sum(c for c, _ in cps.values())} sites, "
          f"{cp_total / 1e6:.2f} MB/iter):")
    for s, (c, b) in sorted(cps.items(), key=lambda kv: -kv[1][0] * kv[1][1]):
        print(f"  {c:3d} x {b / 1e6:8.3f} MB  {s}")
    print(f"\nall-reduces ({sum(c for c, _ in ars.values())} sites, "
          f"{ar_total / 1e6:.3f} MB/iter):")
    for s, (c, b) in sorted(ars.items(), key=lambda kv: -kv[1][0] * kv[1][1]):
        print(f"  {c:3d} x {b / 1e6:8.3f} MB  {s}")

    total = cp_total + ar_total
    print(f"\ntotal cross-chip traffic: {total / 1e6:.2f} MB/iter")
    print(f"v5e ICI projection (~{_ICI_GBPS / 1e9:.0f} GB/s per link-dir): "
          f"~{total / _ICI_GBPS * 1e3:.2f} ms/iter serialized floor "
          "(real cost is lower — permutes overlap compute and ride "
          "independent links)")


if __name__ == "__main__":
    main()
