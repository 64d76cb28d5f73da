#!/usr/bin/env python3
"""Generate a VGG-19 weight fingerprint fixture.

Run this ONCE on any machine where the real pretrained weights exist
(torchvision ``vgg19-dcbb9e9d.pth`` in the torch hub cache, a converted
``.npz``, or an explicit path), then commit the JSON:

    python tools/make_weight_fingerprint.py \
        -o tests/fixtures/vgg19_imagenet1k_v1_fingerprint.json

``tests/test_weight_fingerprint.py`` verifies every machine's resolved
weights against the committed fixture whenever real weights are present —
closing the port-verification gap (OIHW->HWIO transpose, layer offsets) that
shape validation alone cannot catch. See models/fingerprint.py.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument(
        "weights", nargs="?", default=None,
        help="weights path (.npz native or torchvision .pth); default: the "
             "models/weights.py search order",
    )
    ap.add_argument(
        "-o", "--output", default="tests/fixtures/vgg19_fingerprint.json",
        help="output JSON path (default %(default)s)",
    )
    ap.add_argument(
        "--allow-random", action="store_true",
        help="permit fingerprinting the random-weight fallback (mechanism "
             "fixtures only — never commit one as the real fixture)",
    )
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")  # f32 CPU = the reference dtype

    from style_transfer_tpu.models.fingerprint import (
        make_fingerprint,
        save_fingerprint,
    )
    from style_transfer_tpu.models.weights import resolve_params

    params, source = resolve_params(args.weights, allow_random=args.allow_random)
    if source.startswith("random") and not args.allow_random:
        raise SystemExit("refusing to fingerprint random weights")
    print(f"Fingerprinting weights from: {source}")
    fp = make_fingerprint(params, source=source)
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_fingerprint(fp, out)
    for tap, s in fp["activations"].items():
        print(f"  tap {tap}: shape {s['shape']}, mean {s['mean']:.6g}, "
              f"l2 {s['l2']:.6g}")
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
