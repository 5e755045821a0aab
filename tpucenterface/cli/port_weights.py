"""Weight-porting CLI: torch .pth -> flax safetensors (SURVEY.md §2 C10/C14)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Port torch checkpoint to safetensors")
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--width-mult", type=float, default=1.0)
    p.add_argument("--with-landmarks", action="store_true")
    p.add_argument("--auto-map", action="store_true",
                   help="foreign module names: align by shape/order "
                   "(weights.port.propose_name_map); refuses on "
                   "order-ambiguous adjacent same-signature units")
    p.add_argument("--allow-ambiguous", action="store_true",
                   help="with --auto-map: accept an order-ambiguous "
                   "alignment (verify the foreign net registers modules in "
                   "data-flow order FIRST — same-shape units port "
                   "crosswise undetected otherwise)")
    p.add_argument("--report", action="store_true",
                   help="print the propose_name_map report (mapping, "
                   "unmatched keys, ambiguous units) and exit without "
                   "writing")
    args = p.parse_args(argv)

    from tpucenterface.config import ModelConfig
    from tpucenterface.weights.io import save_safetensors
    from tpucenterface.weights.port import load_torch_pth

    cfg = ModelConfig(
        width_mult=args.width_mult, with_landmarks=args.with_landmarks
    )
    if args.report:
        import json

        import torch

        from tpucenterface.weights.port import (
            propose_name_map,
            unwrap_checkpoint,
        )

        ckpt = unwrap_checkpoint(
            torch.load(args.pth, map_location="cpu", weights_only=False)
        )
        prop = propose_name_map(ckpt, cfg)
        print(json.dumps(
            {
                "complete": prop["complete"],
                "n_mapped": len(prop["mapping"]),
                "unmatched_twin": prop["unmatched_twin"],
                "unmatched_foreign": prop["unmatched_foreign"],
                "ambiguous": prop["ambiguous"],
            },
            indent=2,
        ))
        return
    variables = load_torch_pth(
        args.pth, cfg, auto_map=args.auto_map,
        allow_ambiguous=args.allow_ambiguous,
    )
    save_safetensors(variables, args.out)
    print(f"[port] wrote {args.out}")


if __name__ == "__main__":
    main()
