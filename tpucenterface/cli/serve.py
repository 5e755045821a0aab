"""Serving CLI: dynamic-batching detection over an image directory/stream.

The serving-stack counterpart of `cli.demo` (SURVEY.md §2 L6): where demo
drives one video stream through the pipelined single-frame path, this
drives an arbitrary pile of images through the coalescing ServingRouter —
the deployment shape of BASELINE's throughput story (PERFORMANCE.md:
bs32-request streams serve at bs128 device batches, 3.9k bf16 / 4.4k int8
img/s/chip on v5e).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="tpucenterface serving runner")
    p.add_argument("--source", default="synthetic",
                   help="image directory, or 'synthetic' (N random images)")
    p.add_argument("--weights", default=None, help=".safetensors or torch .pth")
    p.add_argument("--n-synthetic", type=int, default=256)
    p.add_argument("--device-batch", type=int, default=128)
    p.add_argument("--size", type=int, default=None,
                   help="model input size (default: config default)")
    p.add_argument("--thresh", type=float, default=0.35)
    p.add_argument("--int8", action="store_true",
                   help="opt-in W8A8 serving forward (calibrates on the "
                   "first device_batch images; NOT the parity path)")
    p.add_argument("--int8-dw", action="store_true",
                   help="with --int8: depthwise convs int8 too (per-channel "
                   "activation scales; the measured-fastest serving forward)")
    p.add_argument("--int8-input", action="store_true",
                   help="with --int8: host-quantized staging (the stem's "
                   "device-exact u8->s8 LUT applied during batch assembly "
                   "by the threaded C++ kernel; bit-identical results, "
                   "+2%% device rate, costs ~1 host core-second per 2-3 GB "
                   "staged — see PERFORMANCE.md r3b)")
    p.add_argument("--calib-percentile", type=float, default=None,
                   help="with --int8: clip-calibrate activation scales at "
                   "this percentile of |x| (e.g. 99.9) instead of the max "
                   "— outlier-robust PTQ")
    p.add_argument("--max-dets", type=int, default=100,
                   help="serving decode top-K per image (eval default 200; "
                   "100 is the measured serving profile); 0 = detector K")
    p.add_argument("--ladder", default=None,
                   help="comma-separated launch-size ladder, e.g. '32,128' "
                   "(default: auto {device_batch//4, device_batch})")
    p.add_argument("--scales", default=None,
                   help="persisted activation-scale JSON (skip calibration; "
                   "weights.io.save_quant_scales)")
    p.add_argument("--save-scales", default=None,
                   help="after calibrating, persist the scales here")
    p.add_argument("--qat-steps", type=int, default=0,
                   help="with --int8 calibration: follow PTQ with "
                   "quantization-aware fine-tuning (bias correction + this "
                   "many STE steps of self-distillation on the calibration "
                   "batch; quant.qat) — never worse than PTQ on the "
                   "calibration set by construction")
    p.add_argument("--adaround-steps", type=int, default=0,
                   help="with --int8 calibration: learn per-weight rounding "
                   "by layer-wise reconstruction before QAT (quant.adaround;"
                   " reverted automatically unless it improves the e2e "
                   "head-map loss); persists through --save-scales + "
                   "--save-qat-params")
    p.add_argument("--weight-bits", type=int, default=8,
                   help="with --int8: weight grid width (8 = W8A8 speed "
                   "path; 4 = W4A8 — accuracy/packed-size option, pair "
                   "with --adaround-steps/--qat-steps; persisted scales "
                   "are self-describing)")
    p.add_argument("--qat-params", default=None,
                   help="persisted QAT-fine-tuned serving params "
                   "(.safetensors from --save-qat-params); use with --scales")
    p.add_argument("--save-qat-params", default=None,
                   help="after QAT, persist the fine-tuned serving params "
                   "here (.safetensors; reinstall via --scales + "
                   "--qat-params)")
    p.add_argument("--packed", default=None,
                   help="load a packed deployment artifact (.npz from "
                   "--save-packed / weights.io.save_packed_weights) — "
                   "implies --int8; replaces --scales/--qat-params; fully "
                   "self-describing (weight bits, int8_dw, frozen scales)")
    p.add_argument("--save-packed", default=None,
                   help="after quantizing, pack the serving weights into "
                   "one .npz (nibble-packed kernels at --weight-bits<=4; "
                   "weights.io.save_packed_weights)")
    p.add_argument("--out", default=None,
                   help="write one JSON line per image (boxes/scores)")
    args = p.parse_args(argv)
    if args.packed and (args.scales or args.qat_params or args.qat_steps
                        or args.adaround_steps):
        p.error("--packed is self-contained; drop --scales/--qat-params/"
                "--qat-steps/--adaround-steps")
    if args.save_packed and not (args.int8 or args.packed):
        p.error("--save-packed requires an int8 serving state (--int8 "
                "calibration/install or --packed)")
    if args.packed:
        args.int8 = True  # the artifact IS an int8 serving forward
    if args.int8_input and not args.int8:
        p.error("--int8-input requires --int8 (the LUT is the int8 stem's)")
    if (args.qat_steps or args.adaround_steps) and args.scales:
        p.error("--qat-steps/--adaround-steps need calibration (omit "
                "--scales); reinstall persisted output via --scales + "
                "--qat-params")
    if args.qat_params and not args.scales:
        p.error("--qat-params requires --scales (both halves of the "
                "persisted QAT output)")

    import cv2
    import numpy as np

    from tpucenterface.detector import Detector
    from tpucenterface.runtime.serving import ServingRouter

    if args.weights and args.weights.endswith(".pth"):
        det = Detector.from_torch_pth(args.weights)
    elif args.weights:
        det = Detector.from_safetensors(args.weights)
    else:
        print("[serve] no --weights: random-init model (boxes are meaningless)")
        det = Detector()

    if args.size:
        import dataclasses

        det.config = dataclasses.replace(det.config, default_size=args.size)
    if args.source == "synthetic":
        rng = np.random.RandomState(0)
        size = det.config.default_size
        names = [f"synthetic_{i}" for i in range(args.n_synthetic)]
        images = [
            rng.randint(0, 255, (size, size, 3), np.uint8) for _ in names
        ]
    else:
        names, images = [], []
        for name in sorted(os.listdir(args.source)):
            img = cv2.imread(os.path.join(args.source, name))
            if img is not None:
                names.append(name)
                images.append(img)
    if not images:
        raise SystemExit(f"no readable images in {args.source}")

    if args.packed:
        from tpucenterface.weights.io import load_packed_weights

        pk_scales, pk_params = load_packed_weights(args.packed)
        det.quantize(scales=pk_scales, quant_params=pk_params)
        print(f"[serve] packed artifact {args.packed}: weight_bits="
              f"{det._quant.weight_bits} int8_dw={det._quant.int8_dw}")
    elif args.int8:
        if args.scales:
            from tpucenterface.weights.io import load_quant_scales

            quant_params = None
            if args.qat_params:
                from tpucenterface.weights.io import load_safetensors

                quant_params = load_safetensors(args.qat_params)["params"]
            scales = det.quantize(
                scales=load_quant_scales(args.scales), int8_dw=args.int8_dw,
                quant_params=quant_params, weight_bits=args.weight_bits,
            )
            print(f"[serve] int8 forward with persisted scales {args.scales}"
                  + (f" + QAT params {args.qat_params}"
                     if args.qat_params else ""))
            if args.save_scales:  # re-export the INSTALLED scales
                from tpucenterface.weights.io import save_quant_scales

                save_quant_scales(scales, args.save_scales)
                print(f"[serve] scales persisted to {args.save_scales}")
        else:
            calib = np.stack(
                [cv2.resize(im, (det.config.default_size,) * 2)
                 for im in images[: args.device_batch]]
            ).astype(np.uint8)
            scales = det.quantize(calib_images=calib, int8_dw=args.int8_dw,
                                  calib_percentile=args.calib_percentile,
                                  qat_steps=args.qat_steps,
                                  adaround_steps=args.adaround_steps,
                                  weight_bits=args.weight_bits)
            print(f"[serve] int8 forward calibrated on {len(calib)} images"
                  + (" (int8_dw per-channel)" if args.int8_dw else ""))
            if args.adaround_steps:
                r = det.last_adaround_report
                print(f"[serve] adaround: accepted={bool(r['_accepted'])} "
                      f"e2e {r['_e2e_first']:.6f}->{r['_e2e_last']:.6f}")
            if args.qat_steps:
                print(f"[serve] QAT fine-tune: {det.last_qat_metrics}")
            if args.save_scales:
                from tpucenterface.weights.io import save_quant_scales

                save_quant_scales(scales, args.save_scales)
                print(f"[serve] scales persisted to {args.save_scales}")
            if args.save_qat_params:
                from tpucenterface.weights.io import save_safetensors

                save_safetensors(det.quant_variables, args.save_qat_params)
                print(f"[serve] QAT params persisted to "
                      f"{args.save_qat_params}")

    if args.save_packed:
        from tpucenterface.weights.io import save_packed_weights

        sz = save_packed_weights(det, args.save_packed)
        print(f"[serve] packed artifact -> {args.save_packed} "
              f"({sz['packed_bytes']/1e6:.2f} MB vs "
              f"{sz['f32_bytes']/1e6:.2f} MB f32)")

    out_f = open(args.out, "w") if args.out else None
    t0 = time.perf_counter()
    ladder = (
        tuple(int(b) for b in args.ladder.split(",")) if args.ladder else None
    )
    with ServingRouter(
        det,
        device_batch=args.device_batch,
        score_thresh=args.thresh,
        max_dets=args.max_dets or None,
        batch_ladder=ladder,
        int8_input=args.int8_input,
    ) as router:
        futures = [(n, router.submit(im)) for n, im in zip(names, images)]
        n_faces = 0
        for name, fut in futures:
            d = fut.result()
            n_faces += len(d.scores)
            if out_f:
                out_f.write(json.dumps({
                    "image": name,
                    "boxes": np.round(d.boxes, 2).tolist(),
                    "scores": np.round(d.scores, 4).tolist(),
                }) + "\n")
        stats = {
            hw: eng.stats() for hw, eng in router._engines.items()
        }
    dt = time.perf_counter() - t0
    if out_f:
        out_f.close()
    print(json.dumps({
        "images": len(images),
        "faces": n_faces,
        "wall_s": round(dt, 2),
        "img_per_s": round(len(images) / dt, 1),
        "engines": {str(k): v for k, v in stats.items()},
    }))


if __name__ == "__main__":
    main()
