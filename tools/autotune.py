"""Per-canvas StepConfig autotuner: coordinate descent over the layout knobs.

``engine.auto_size_knobs`` encodes v5e-measured rules (pool impl, im2col
taps/backward, band grid, pairing). On a different TPU generation — or
after a toolchain update shifts the emitter trade-offs — those tables can
go stale. This tool re-derives the best configuration for a given canvas
empirically: starting from the engine's auto knobs, it optimizes one knob
at a time against the measured fused-step wall (tools/profile_step.
time_step), keeping a change only when it wins by more than a noise
margin. Results print as a JSON line usable as CLI flags / StepConfig
overrides.

Usage: python tools/autotune.py [H] [W] [--rounds N] [--margin PCT]
       [--out FILE]

One full pass is typically 8-15 step compiles; with the persistent compile
cache, re-runs are cheap. The sweep is sequential on purpose — a single
chip, one timing at a time.
"""

import json
import sys
from pathlib import Path

# Make both the package root and tools/ importable regardless of how the
# script is launched (direct, runpy, or from another cwd).
_HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE.parent))
sys.path.insert(0, str(_HERE))


def candidates(h: int, w: int, base: dict):
    """Per-knob candidate values around the auto configuration."""
    cand = {
        "maxpool_impl": ["first", "paired", "xla"],
        "im2col_grad": ["conv", "patch"],
        "im2col_layers": [(10, 19, 28), (10, 28), ()],
    }
    if w % 2 == 0:
        cand["paired_early"] = [True, False]
    nb = base.get("n_bands", 0)
    if nb >= 2:
        steps = sorted({max(2, round(nb * f)) for f in (0.75, 1.0, 1.25)}
                       | {0})  # always offer the unbanded trunk too
        cand["n_bands"] = steps
        nbw = base.get("n_bands_w", 0)
        cand["n_bands_w"] = sorted({0, nbw, 2, 3} - {1})
    else:
        cand["n_bands"] = [0, 2]
    return cand


def main():
    args = [a for a in sys.argv[1:]]

    def opt(flag, default, cast):
        if flag in args:
            i = args.index(flag)
            v = cast(args[i + 1])
            del args[i:i + 2]
            return v
        return default

    rounds = opt("--rounds", 2, int)
    margin = opt("--margin", 1.0, float) / 100.0
    out_path = opt("--out", None, str)
    h = int(args[0]) if args else 512
    w = int(args[1]) if len(args) > 1 else h

    from profile_step import time_step
    from style_transfer_tpu.engine import auto_size_knobs

    base = auto_size_knobs(h, w, is_tpu=True)
    base.pop("shard_bands", None)
    base.pop("remat", None)
    base.pop("band_scan", None)
    cfg = dict(base)
    cand = candidates(h, w, base)

    timed = {}

    def measure(c):
        key = tuple(sorted((k, tuple(v) if isinstance(v, (list, tuple))
                            else v) for k, v in c.items()))
        if key not in timed:
            kw = dict(c)
            mp = kw.pop("maxpool_impl")
            timed[key] = time_step(h, w, mp, iters=50 if h * w < 2e6 else 20,
                                   reps=3, **kw)
        return timed[key]

    best = measure(cfg)
    print(f"[autotune] start (engine auto): {best:.2f} ms/iter", flush=True)
    for rnd in range(rounds):
        changed = False
        for knob, values in cand.items():
            for v in values:
                if cfg.get(knob) == v:
                    continue
                trial = dict(cfg, **{knob: v})
                t = measure(trial)
                if t < best * (1.0 - margin):
                    print(f"[autotune] {knob}={v!r}: {t:.2f} < {best:.2f} "
                          "ms/iter — keeping", flush=True)
                    cfg, best, changed = trial, t, True
        if not changed:
            break
    gain = (measure(base) - best) / measure(base) * 100.0
    record = {
        "h": h, "w": w, "ms_per_iter": round(best, 3),
        "gain_vs_auto_pct": round(gain, 2),
        "knobs": {k: (list(v) if isinstance(v, tuple) else v)
                  for k, v in cfg.items()},
    }
    line = json.dumps(record)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n")


if __name__ == "__main__":
    main()
