"""Build a local LPIPS weight bundle (utils/lpips.py format) from torch files.

This machine has no network egress, so the LPIPS backbone + learned linear
head cannot be downloaded here. Run this tool wherever the checkpoints
exist and copy the resulting .npz next to the repo (./weights/) or into
~/.cache/style_transfer_tpu/ — utils/metrics.perceptual_distance then
switches from the VGG-distance proxy to real LPIPS automatically.

Inputs:
  --backbone  torchvision checkpoint .pth of the backbone features
              (alexnet: AlexNet_Weights.IMAGENET1K_V1; vgg16:
              VGG16_Weights.IMAGENET1K_V1). A full-model state_dict is fine;
              only the ``features.*`` conv entries are used.
  --lin       the official LPIPS linear-head .pth for that net
              (richzhang/PerceptualSimilarity lpips/weights/v0.1/<net>.pth;
              keys ``lin{j}.model.1.weight`` of shape (1, C, 1, 1)).
  --net       alex | vgg16
  --out       output .npz (default lpips_<net>.npz)

Usage:
    python tools/port_lpips.py --net alex \
        --backbone alexnet-owt-7be5be79.pth --lin lpips_v01_alex.pth \
        --out lpips_alex.npz
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from style_transfer_tpu.utils.lpips import LPIPS_NETS, load_bundle  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--net", choices=sorted(LPIPS_NETS), required=True)
    p.add_argument("--backbone", required=True)
    p.add_argument("--lin", required=True)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import torch

    spec = LPIPS_NETS[args.net]
    out_path = Path(args.out or f"lpips_{args.net}.npz")

    sd = torch.load(args.backbone, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # Conv entries of the .features stack, in forward order. torchvision
    # indexes convs by their position among relu/pool layers; sorting the
    # integer indices recovers forward order for both alexnet and vgg16.
    conv_idx = sorted(
        int(k.split(".")[1]) for k in sd
        if k.startswith("features.") and k.endswith(".weight")
    )
    if len(conv_idx) != len(spec):
        sys.exit(f"backbone has {len(conv_idx)} convs, {args.net} "
                 f"needs {len(spec)}")

    arrays = {}
    cin = 3
    for i, (idx, (cout, k, _s, _p, _pool, _tap)) in enumerate(
            zip(conv_idx, spec)):
        w = sd[f"features.{idx}.weight"].numpy()  # OIHW
        b = sd[f"features.{idx}.bias"].numpy()
        if w.shape != (cout, cin, k, k):
            sys.exit(f"conv{i}: got {w.shape}, expected {(cout, cin, k, k)}")
        arrays[f"conv{i}_kernel"] = np.ascontiguousarray(
            w.transpose(2, 3, 1, 0).astype(np.float32))  # OIHW -> HWIO
        arrays[f"conv{i}_bias"] = b.astype(np.float32)
        cin = cout

    lin_sd = torch.load(args.lin, map_location="cpu")
    if hasattr(lin_sd, "state_dict"):
        lin_sd = lin_sd.state_dict()
    taps = [e for e in spec if e[5]]
    for j, entry in enumerate(taps):
        key = next((k for k in (f"lin{j}.model.1.weight", f"lin{j}.weight",
                                f"lins.{j}.model.1.weight") if k in lin_sd),
                   None)
        if key is None:
            sys.exit(f"lin{j} not found in {args.lin} "
                     f"(keys: {sorted(lin_sd)[:8]}...)")
        lin = lin_sd[key].numpy().reshape(-1).astype(np.float32)
        if lin.shape != (entry[0],):
            sys.exit(f"lin{j}: got {lin.shape}, expected ({entry[0]},)")
        arrays[f"lin{j}"] = lin

    meta = {"format": "stt-lpips", "version": 1, "net": args.net}
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    with open(out_path, "wb") as f:
        np.savez(f, **arrays)
    load_bundle(out_path)  # self-check
    print(f"wrote {out_path} ({out_path.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
