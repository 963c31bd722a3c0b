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
    import dataclasses

    import torch

    from ..models.clip.convert import (
        convert_hf_state_dict,
        convert_open_clip_state_dict,
        count_layers,
        infer_clip_config,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("out")
    parser.add_argument("--layout", default="open_clip",
                        choices=["open_clip", "hf"])
    parser.add_argument("--no-quick-gelu", action="store_true",
                        help="checkpoint was trained with exact GELU (the "
                             "reference's ViT-B-32-quickgelu uses quick)")
    parser.add_argument("--vision-heads", type=int, default=0,
                        help="override the width//64 head-count convention")
    parser.add_argument("--text-heads", type=int, default=0)
    args = parser.parse_args(argv)

    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    if args.layout == "open_clip":
        params = convert_open_clip_state_dict(
            sd,
            vision_layers=count_layers(sd, "visual.transformer.resblocks."),
            text_layers=count_layers(sd, "transformer.resblocks."),
        )
    else:
        params = convert_hf_state_dict(
            sd,
            vision_layers=count_layers(sd, "vision_model.encoder.layers."),
            text_layers=count_layers(sd, "text_model.encoder.layers."),
        )

    # self-describing checkpoint: embed the (shape-inferred) config so
    # ClipEngine.from_checkpoint / the SAI_CLIP_CHECKPOINT serve path build
    # the right architecture without out-of-band flags
    cfg = infer_clip_config(
        params, quick_gelu=not args.no_quick_gelu,
        vision_heads=args.vision_heads, text_heads=args.text_heads,
    )
    payload = {
        "format": "sai_clip_params",
        "config": dataclasses.asdict(cfg),
        "params": params,
    }

    from ..utils.atomic import atomic_pickle_dump

    atomic_pickle_dump(args.out, payload)
    print(f"wrote {args.out} ({cfg})")


if __name__ == "__main__":
    main()
