"""Dump the optimized HLO of the fused step for layout/fusion forensics.

Usage: python tools/dump_hlo.py [H] [W] [maxpool_impl] [out.txt]
Writes the post-optimization HLO text; grep fusion names from
tools/profile_step.py output against it.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    maxpool = sys.argv[3] if len(sys.argv) > 3 else "paired"
    out = sys.argv[4] if len(sys.argv) > 4 else f"/tmp/step_{h}x{w}_{maxpool}.hlo"

    import __graft_entry__ as g
    from style_transfer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    runner, params, consts, state = g._build(
        n_h=h, n_w=w, compute_dtype="bfloat16", sqrtm_impl="pallas",
        maxpool_impl=maxpool,
    )
    compiled = runner.lower(params, consts, state, 50).compile()
    text = compiled.as_text()
    Path(out).write_text(text)
    print(f"wrote {len(text)} bytes to {out}")


if __name__ == "__main__":
    main()
