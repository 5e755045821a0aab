"""Weight-porting CLI: torch .pth -> flax safetensors (SURVEY.md §2 C10/C14)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Port torch checkpoint to safetensors")
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--width-mult", type=float, default=1.0)
    args = p.parse_args(argv)

    from tpucenterface.config import ModelConfig
    from tpucenterface.weights.io import save_safetensors
    from tpucenterface.weights.port import load_torch_pth

    cfg = ModelConfig(width_mult=args.width_mult)
    variables = load_torch_pth(args.pth, cfg)
    save_safetensors(variables, args.out)
    print(f"[port] wrote {args.out}")


if __name__ == "__main__":
    main()
