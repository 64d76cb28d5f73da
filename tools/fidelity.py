"""One-command fidelity harness against real reference outputs (VERDICT r2 #5).

Runs the BASELINE.json graded workloads with pretrained VGG-19 weights and
reports PSNR / SSIM / ``vgg_distance`` (the LPIPS-style proxy from
``utils/metrics.py``) of this framework's outputs against outputs produced by
the reference implementation. The north-star check (BASELINE.md: LPIPS < 0.02
at 2896px) becomes runnable the moment real weights are available — this
environment has no network egress, so ``--vgg-weights`` must point at a
ported torchvision ``IMAGENET1K_V1`` checkpoint (.npz via tools/port_weights.py
or the raw .pth).

Reference outputs: run the reference tool with the matching flags and collect
its outputs under one directory, named ``<config>.png``:

    c1_single256   style_transfer C S -o c1_single256.png -s 256 -ms 256 -i 500 -ii 500 -r 0
    c2_pyramid512  style_transfer C S -o c2_pyramid512.png -r 0
    c3_multistyle  style_transfer C S1 S2 -sw 2 1 -o c3_multistyle.png -r 0
    c4_gram        (reference defines Gram loss but never wires it; compare against
                    this framework's own committed output, or skip)
    c4_avg         style_transfer C S -o c4_avg.png --pooling average -r 0
    c4_l2          style_transfer C S -o c4_l2.png --pooling l2 -r 0
    c5_print       style_transfer C S -o c5_print.tiff -s 2896 -r 0

Note: pixel-exact trajectories across frameworks are not expected (different
conv accumulation orders); the graded criterion is perceptual (LPIPS-proxy),
per BASELINE.json. Seeds only matter for non-content ``--init`` modes.

Usage:
    python tools/fidelity.py CONTENT STYLE [STYLE2 ...] \
        --reference DIR [--vgg-weights W.npz] [--configs c1,c2,...] \
        [--out DIR] [--end-scale 512] [--devices 1]

Prints one JSON line per config plus a summary; exit 1 if any compared
config misses the thresholds (psnr < 20 or vgg_distance >= 0.02).
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PSNR_FLOOR = 20.0
LPIPS_PROXY_CEIL = 0.02


def config_plan(args):
    """(name, constructor kwargs, stylize kwargs, needs_n_styles)."""
    end = args.end_scale
    plans = [
        ("c1_single256", {}, dict(min_scale=256, end_scale=256,
                                  iterations=500, initial_iterations=500), 1),
        ("c2_pyramid512", {}, dict(end_scale=end), 1),
        ("c3_multistyle", {}, dict(end_scale=end, style_weights=[2.0, 1.0]), 2),
        ("c4_gram", {"style_loss": "gram"}, dict(end_scale=end), 1),
        ("c4_avg", {"pooling": "average"}, dict(end_scale=end), 1),
        ("c4_l2", {"pooling": "l2"}, dict(end_scale=end), 1),
        ("c5_print", {}, dict(end_scale=2896), 1),
    ]
    if args.configs:
        want = {c.strip() for c in args.configs.split(",")}
        unknown = want - {name for name, *_ in plans}
        if unknown:
            sys.exit(f"unknown configs: {sorted(unknown)}")
        plans = [p for p in plans if p[0] in want]
    else:
        plans = [p for p in plans if p[0] != "c5_print"]  # opt-in (minutes)
    return plans


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("content")
    p.add_argument("styles", nargs="+", metavar="style")
    p.add_argument("--reference", type=str, default=None,
                   help="directory of reference outputs (<config>.png), or a "
                        "single file when exactly one config is selected")
    p.add_argument("--vgg-weights", type=str, default=None)
    p.add_argument("--lpips-weights", type=str, default=None,
                   help="LPIPS bundle (.npz from tools/port_lpips.py); when "
                        "omitted, $STT_LPIPS_WEIGHTS and default locations "
                        "are searched — real LPIPS is reported whenever a "
                        "bundle resolves, the VGG-distance proxy otherwise")
    p.add_argument("--configs", type=str, default=None,
                   help="comma list (default: all but c5_print)")
    p.add_argument("--out", type=str, default="fidelity_out")
    p.add_argument("--end-scale", type=int, default=512)
    p.add_argument("--devices", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--iterations", type=int, default=None,
                   help="override per-scale (and initial) iterations — for "
                        "smoke-testing the harness itself")
    p.add_argument("--min-scale", type=int, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (JAX_PLATFORMS env is ignored "
                        "under this machine's axon profile)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from style_transfer_tpu.engine import StyleTransfer
    from style_transfer_tpu.io_color import load_image
    from style_transfer_tpu.utils.metrics import (
        perceptual_distance,
        psnr,
        ssim,
    )

    content = load_image(args.content)
    styles = [load_image(s) for s in args.styles]
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    ref_dir = Path(args.reference) if args.reference else None
    plans = config_plan(args)

    # Metrics use the SAME weights as the run: with random fallback weights
    # the perceptual distance is meaningless vs the reference — warn loudly.
    results, failed = [], []
    params = None
    for name, ctor_kw, sty_kw, needs in plans:
        if len(styles) < needs:
            print(json.dumps({"config": name, "skipped": "needs >=2 styles"}))
            continue
        st = StyleTransfer(devices=args.devices, weights=args.vgg_weights,
                           **ctor_kw)
        if params is None:
            params = st.params
            if "random" in st.weights_source:
                print("WARNING: running with RANDOM VGG weights — metrics "
                      "against reference outputs are meaningless. Pass "
                      "--vgg-weights.", file=sys.stderr)
        st.seed(args.seed)
        sk = dict(sty_kw)
        if needs == 1:
            sk.pop("style_weights", None)
        if args.iterations is not None:
            sk["iterations"] = sk["initial_iterations"] = args.iterations
        if args.min_scale is not None:
            sk["min_scale"] = args.min_scale
        img = st.stylize(content, styles[:needs] if needs > 1 else styles[:1],
                         **sk)
        out_path = out_dir / f"{name}.png"
        img.save(out_path)

        rec = {"config": name, "output": str(out_path),
               "weights": st.weights_source}
        ref_path = None
        if ref_dir is not None:
            if ref_dir.is_file() and len(plans) == 1:
                ref_path = ref_dir
            else:
                for suffix in (".png", ".jpg", ".tiff", ".tif"):
                    cand = ref_dir / f"{name}{suffix}"
                    if cand.is_file():
                        ref_path = cand
                        break
        if ref_path is not None:
            ref = np.asarray(
                Image.open(ref_path).convert("RGB"), np.float64) / 255.0
            ours = np.asarray(img.convert("RGB"), np.float64) / 255.0
            if ref.shape != ours.shape:
                rec["error"] = (f"shape mismatch: ref {ref.shape} vs "
                                f"ours {ours.shape}")
                failed.append(name)
            else:
                rec["psnr"] = round(psnr(ours, ref), 3)
                rec["ssim"] = round(ssim(ours, ref), 4)
                dist, kind = perceptual_distance(
                    ours, ref, params=params,
                    lpips_weights=args.lpips_weights)
                rec["perceptual"] = round(dist, 5)
                rec["perceptual_metric"] = kind
                rec["pass"] = (rec["psnr"] >= PSNR_FLOOR
                               and rec["perceptual"] < LPIPS_PROXY_CEIL)
                if not rec["pass"]:
                    failed.append(name)
        else:
            rec["note"] = "no reference output found; generated only"
        results.append(rec)
        print(json.dumps(rec), flush=True)

    compared = [r for r in results if "pass" in r]
    print(json.dumps({
        "summary": {"run": len(results), "compared": len(compared),
                    "passed": sum(r["pass"] for r in compared),
                    "thresholds": {"psnr_min": PSNR_FLOOR,
                                   "perceptual_max": LPIPS_PROXY_CEIL}},
    }))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
