#!/usr/bin/env python
"""Convert torch checkpoints into mde_tpu formats.

Two modes:
  backbone: a gen-efficientnet `tf_efficientnet_{b1,b5}_ap` state dict (.pth)
            -> backbone .npz for --pretrained_backbone
  full:     a reference/AdaBins training checkpoint (.pt with {model, ...})
            -> orbax-style params tree saved as .npz pair

Usage:
  python scripts/convert_torch_checkpoint.py backbone tf_efficientnet_b1_ap.pth out.npz --arch efficientnet-b1
  python scripts/convert_torch_checkpoint.py full AdaBins_nyu.pt out_dir --encoder efficientnet-b1
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("backbone")
    b.add_argument("src")
    b.add_argument("dst")
    b.add_argument("--arch", default="efficientnet-b1",
                   choices=["efficientnet-b1", "efficientnet-b5"])

    f = sub.add_parser("full")
    f.add_argument("src")
    f.add_argument("dst")
    f.add_argument("--encoder", default="efficientnet-b1")

    args = ap.parse_args()

    import torch
    from mde_tpu.checkpoint import (convert_backbone_statedict,
                                    convert_reference_checkpoint,
                                    save_backbone_npz)

    if args.cmd == "backbone":
        sd = torch.load(args.src, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        params, stats = convert_backbone_statedict(sd, args.arch)
        save_backbone_npz(params, stats, args.dst)
        print(f"wrote backbone weights -> {args.dst}")
    else:
        params, stats = convert_reference_checkpoint(args.src, args.encoder)
        save_backbone_npz(params, stats, args.dst)
        print(f"wrote full model weights -> {args.dst}")


if __name__ == "__main__":
    main()
