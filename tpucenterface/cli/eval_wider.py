"""WIDER FACE val evaluation CLI (SURVEY.md §2 C11, §3.3, config #3)."""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description="WIDER val AP evaluation")
    p.add_argument("--gt-dir", required=True,
                   help="eval_tools ground_truth dir with wider_face_val.mat etc.")
    p.add_argument("--images-root", required=True, help="WIDER_val/images")
    p.add_argument("--weights", default=None)
    p.add_argument("--tta", action="store_true", help="flip + multi-scale TTA")
    p.add_argument("--scales", default="0.5,1.0,1.5",
                   help="TTA scale multipliers (with --tta)")
    p.add_argument("--thresh", type=float, default=0.01)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--out-dets", default=None,
                   help="also dump WIDER-format detection txts here")
    p.add_argument("--per-image", action="store_true",
                   help="legacy per-image dispatch (default: bucketed batches"
                        " with device-side flip, the TPU-shaped path)")
    p.add_argument("--batch-size", type=int, default=64)  # 2B=128 flip forwards: the v5e occupancy knee
    p.add_argument("--size", type=int, default=None,
                   help="model input size (default: config default, 640)")
    p.add_argument("--int8", action="store_true",
                   help="evaluate the W8A8 serving forward's AP (calibrates "
                   "on the first 8 eval images unless --quant-scales; the "
                   "direct real-data check behind the serving int8 AP pin)")
    p.add_argument("--int8-dw", action="store_true",
                   help="with --int8: per-channel int8 depthwise (the "
                   "measured-fastest serving forward)")
    p.add_argument("--weight-bits", type=int, default=8,
                   help="with --int8: weight grid width (8 = W8A8; 4 = "
                   "W4A8 accuracy study — pair with adaround/QAT; "
                   "Detector.quantize docstring)")
    p.add_argument("--quant-scales", default=None,
                   help="persisted activation-scale JSON "
                   "(weights.io.save_quant_scales) instead of calibrating")
    args = p.parse_args(argv)
    if args.int8_dw and not args.int8:
        p.error("--int8-dw requires --int8")

    from tpucenterface.detector import Detector
    from tpucenterface.eval.batch_runner import batched_detect_tta
    from tpucenterface.eval.tta import detect_tta
    from tpucenterface.eval.wider_eval import evaluate_wider

    if args.weights and args.weights.endswith(".pth"):
        det = Detector.from_torch_pth(args.weights)
    elif args.weights:
        det = Detector.from_safetensors(args.weights)
    else:
        print("[eval] no --weights: random-init model (AP will be ~0)")
        det = Detector()

    if args.size:
        import dataclasses

        det.config = dataclasses.replace(det.config, default_size=args.size)

    if args.int8:
        if args.quant_scales:
            from tpucenterface.weights.io import load_quant_scales

            det.quantize(
                scales=load_quant_scales(args.quant_scales),
                int8_dw=args.int8_dw,
                weight_bits=args.weight_bits,
            )
            print("[eval] int8 forward with persisted scales")
        else:
            # calibrate on real eval images (first 8, resized to model size)
            import cv2
            import numpy as np
            import os

            from tpucenterface.eval.wider_eval import load_wider_gt

            gt = load_wider_gt(args.gt_dir)["easy"]
            size = det.config.default_size
            calib = []
            for ev, fs in zip(gt["events"], gt["files"]):
                for f in fs:
                    img = cv2.imread(
                        os.path.join(args.images_root, ev, f + ".jpg")
                    )
                    if img is not None:
                        calib.append(cv2.resize(img, (size, size)))
                    if len(calib) >= 8:
                        break
                if len(calib) >= 8:
                    break
            if not calib:
                raise SystemExit("[eval] --int8: no calibration images found")
            det.quantize(
                calib_images=np.stack(calib).astype(np.uint8),
                int8_dw=args.int8_dw,
                weight_bits=args.weight_bits,
            )
            print(f"[eval] int8 forward calibrated on {len(calib)} eval images")

    scales = tuple(float(s) for s in args.scales.split(",")) if args.tta else (1.0,)

    def det_fn(img):
        if args.tta:
            return detect_tta(det, img, scales=scales, flip=True,
                              score_thresh=args.thresh)
        return det.detect(img, score_thresh=args.thresh)[:2]

    def batch_det_fn(imgs):
        if args.tta:
            return batched_detect_tta(
                det, imgs, scales=scales, flip=True,
                score_thresh=args.thresh, batch_size=args.batch_size,
            )
        from tpucenterface.eval.batch_runner import batched_detect

        return batched_detect(
            det, imgs, score_thresh=args.thresh, batch_size=args.batch_size
        )

    on_det = None
    if args.out_dets:
        from tpucenterface.data.wider import write_wider_detections

        def on_det(rel, boxes, scores):
            write_wider_detections(args.out_dets, rel, boxes, scores)

    aps = evaluate_wider(
        det_fn if args.per_image else None,
        args.gt_dir,
        args.images_root,
        max_images=args.max_images,
        on_detection=on_det,
        batch_det_fn=None if args.per_image else batch_det_fn,
    )
    print(json.dumps({f"AP_{k}": round(v, 4) for k, v in aps.items()}))


if __name__ == "__main__":
    main()
