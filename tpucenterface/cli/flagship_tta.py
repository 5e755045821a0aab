"""TTA accuracy value on the flagship model: single vs flip vs flip+multiscale.

Why (VERDICT r4 task 7): the TTA machinery's *speed* is measured (742 img/s
device replay, PERFORMANCE.md r3); its *accuracy value* never was. This
measures, on the trained flagship model's held-out synthetic val split, the
WIDER-protocol AP of:

  single-scale detect (the product path, input 320)
  flip TTA            (device-side mirrored forward, host NMS merge)
  flip + multi-scale  (each image at several bucket sizes)

and writes a 3-row table to JSON (PERFORMANCE.md carries the measured run).
The TTA rows ride the production eval path (eval/batch_runner.batched_
detect_tta: bucketed batches, in-program flip, pipelined launches) — the
same code WIDER-val eval uses (SURVEY.md §3.3 config #3).

Run after training (real TPU, ~5 min):
    python -m tpucenterface.cli.flagship_tta --workdir runs/flagship
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--workdir", default="runs/flagship")
    p.add_argument("--weights", default=None,
                   help="default <workdir>/model_ema.safetensors")
    p.add_argument("--data-dir", default=None, help="default <workdir>/data")
    p.add_argument("--val-images", type=int, default=240)
    p.add_argument("--seed", type=int, default=0,
                   help="must match the training run (val split = seed+7777)")
    p.add_argument("--input-size", type=int, default=320)
    p.add_argument("--hw-min", type=int, default=384)
    p.add_argument("--hw-max", type=int, default=512)
    p.add_argument("--min-face", type=float, default=18.0)
    # scale 0.7 maps the 384-512 scenes mostly onto the trained 320 bucket;
    # 1.0 runs near-native resolution (the small-face recovery scale)
    p.add_argument("--scales", type=float, nargs="+", default=[0.7, 1.0])
    p.add_argument("--out", default=None,
                   help="default <workdir>/flagship_tta.json")
    p.add_argument("--landmarks", action="store_true",
                   help="weights carry the 5-point landmark head: the report "
                   "gains single-scale and TTA landmark-NME rows (the TTA "
                   "merge un-mirrors/pair-swaps landmarks device-side)")
    args = p.parse_args(argv)

    from tpucenterface.config import DecodeConfig, DetectorConfig, ModelConfig
    from tpucenterface.data.synth import generate_dataset
    from tpucenterface.detector import Detector
    from tpucenterface.eval.synth_eval import (
        ap_on_records,
        ap_on_records_tta,
        landmark_nme,
    )
    from tpucenterface.weights.io import load_safetensors

    data_dir = args.data_dir or os.path.join(args.workdir, "data")
    val_recs = generate_dataset(
        os.path.join(data_dir, "val"), args.val_images, seed=args.seed + 7777,
        hw_range=(args.hw_min, args.hw_max), min_face=args.min_face,
    )
    weights = args.weights or os.path.join(
        args.workdir, "model_ema.safetensors"
    )
    det = Detector(
        variables=load_safetensors(weights),
        config=DetectorConfig(
            model=ModelConfig(with_landmarks=args.landmarks),
            decode=DecodeConfig(max_dets=100),
            default_size=args.input_size,
        ),
    )

    table = {}
    table["single"] = ap_on_records(det, val_recs, size=args.input_size)
    print("single:", table["single"])
    table["flip"] = ap_on_records_tta(
        det, val_recs, scales=args.scales[:1], flip=True
    )
    print("flip:", table["flip"])
    table["flip_multiscale"] = ap_on_records_tta(
        det, val_recs, scales=args.scales, flip=True
    )
    print("flip_multiscale:", table["flip_multiscale"])

    report = {
        "weights": weights,
        "val_images": args.val_images,
        "input_size": args.input_size,
        "scales": list(args.scales),
        "ap": table,
    }
    if args.landmarks:
        # faces below ~25 px have landmark spacing near the stride-4 grid
        # pitch — same eligibility floor train_flagship's NME row uses
        nme = {
            "single": landmark_nme(
                det, val_recs, size=args.input_size, min_side=25.0
            ),
            "flip_multiscale": landmark_nme(
                det, val_recs, tta=True, scales=args.scales, min_side=25.0
            ),
        }
        report["nme"] = nme
        print("nme:", json.dumps(nme))
    out = args.out or os.path.join(args.workdir, "flagship_tta.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(table))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
