"""CLIP checkpoint conversion CLI: open_clip / HF torch checkpoint -> Flax
params pickle loadable by ClipEngine.from_checkpoint.

Usage:
  python -m spatially_aware_ai_tpu.cli.convert_clip open_clip_pytorch_model.bin
      out_params.pkl [--layout open_clip|hf]

The reference deployment uses ViT-B-32-quickgelu / laion400m_e32
(clipfusion.py:1188-1189); download its open_clip checkpoint on a connected
machine and convert here.
"""
from __future__ import annotations

import argparse
import pickle


def main(argv=None):
    import torch

    from ..models.clip.convert import (
        convert_hf_state_dict,
        convert_open_clip_state_dict,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("out")
    parser.add_argument("--layout", default="open_clip",
                        choices=["open_clip", "hf"])
    args = parser.parse_args(argv)

    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    if args.layout == "open_clip":
        params = convert_open_clip_state_dict(sd)
    else:
        params = convert_hf_state_dict(sd)

    from ..utils.atomic import atomic_pickle_dump

    atomic_pickle_dump(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
