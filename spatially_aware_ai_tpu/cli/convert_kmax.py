"""kMaX-DeepLab checkpoint conversion CLI: the official detectron2-format
`kmax_convnext_large.pth` (reference clip_seem_fusion.py:78-79,
handy_utils.py:29-45) -> Flax variables pickle loadable by
KmaxSegmenter.from_checkpoint.

Usage:
  python -m spatially_aware_ai_tpu.cli.convert_kmax kmax_convnext_large.pth
      out_kmax_params.pkl

The converter implements the detectron2-style naming contract documented in
models/kmax/convert.py; if the real checkpoint's leaf names differ, a
one-line edit of that table fixes it (all tensor-layout transforms are
parity-tested). `--list-missing` prints any state-dict keys the converter
did not consume, to make that reconciliation immediate.
"""
from __future__ import annotations

import argparse
import pickle


def main(argv=None):
    import torch

    from ..models.kmax.convert import convert_kmax_checkpoint

    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("out")
    parser.add_argument("--config", default="large",
                        choices=["large", "tiny"],
                        help="model config the checkpoint matches (large = "
                             "the reference's ConvNeXt-L deployment)")
    parser.add_argument("--list-missing", action="store_true",
                        help="print state-dict keys the converter did not "
                             "consume (naming reconciliation aid)")
    args = parser.parse_args(argv)

    from ..models.kmax.model import KMAX_CONVNEXT_LARGE, KMAX_TINY_TEST

    cfg = {"large": KMAX_CONVNEXT_LARGE, "tiny": KMAX_TINY_TEST}[args.config]

    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and not any(
        k.startswith("backbone.") for k in sd
    ):
        sd = sd["model"]
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    if args.list_missing:
        consumed = set()

        class Recorder(dict):
            def __getitem__(self, k):
                consumed.add(k)
                return super().__getitem__(k)

        variables = convert_kmax_checkpoint(Recorder(sd), cfg)
        missing = sorted(
            k for k in set(sd) - consumed
            # BN step counters carry no weights
            if not k.endswith("num_batches_tracked")
        )
        if missing:
            print(f"{len(missing)} unconsumed keys:")
            for k in missing:
                print(f"  {k}")
    else:
        variables = convert_kmax_checkpoint(sd, cfg)

    import dataclasses

    from ..utils.atomic import atomic_pickle_dump

    # self-describing checkpoint: KmaxSegmenter.from_checkpoint / the
    # SAI_KMAX_CHECKPOINT serve path rebuild this exact config
    payload = {
        "format": "sai_kmax_variables",
        "config": dataclasses.asdict(cfg),
        "variables": variables,
    }
    atomic_pickle_dump(args.out, payload)
    print(f"wrote {args.out} (config={args.config})")


if __name__ == "__main__":
    main()
