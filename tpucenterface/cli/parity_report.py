"""One-command parity runbook: reference .pth -> port + activation + boxes
(+ optional WIDER AP) report.

Why this exists (VERDICT r3 #6): the day the real reference checkpoint (and
optionally the WIDER val set) appears, parity must be a single command, not
an archaeology session across three CLIs. This runs, in order:

1. PORT — load the checkpoint (twin naming contract, or --auto-map for
   foreign module names), report the mapping/ambiguities, and port to flax.
2. LAYERS — run the torch twin and the flax model on the same input and
   report the max-abs activation diff per module (torch forward hooks vs
   flax capture_intermediates), in network order. Gate: --atol (default
   2e-3, the pinned head-map tolerance from tests/test_parity.py).
3. BOXES — full product-path check on sample images (provided via --images
   or synthesized): `Detector.detect` (device letterbox -> folded/fused
   forward -> decode -> inverse transform) vs the torch reference pipeline
   (same letterbox -> twin -> the SAME decode on its maps). Reports
   greedy-IoU match fraction and score deltas. Gate: --min-box-match.
4. AP — when --gt-dir/--images-root point at WIDER val, the official
   protocol AP table (Easy/Medium/Hard, optional flip+multiscale TTA).

Exit code 0 only if every gate passes — CI-able on the real artifacts.
Exercised in tests via the torch twin + synthetic .mat fixtures
(tests/test_parity_report.py); see README "Parity runbook".

Reference context: covers SURVEY.md §6 benchmark config #1 (parity with
ported reference weights "within float tolerance") end to end.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Optional


def _port_stage(args, cfg):
    """Load + port the checkpoint; returns (report, twin_named_sd, variables)."""
    import torch

    from tpucenterface.weights.port import (
        flax_from_torch_state,
        propose_name_map,
        unwrap_checkpoint,
    )

    ckpt = unwrap_checkpoint(
        torch.load(args.pth, map_location="cpu", weights_only=False)
    )
    report: Dict = {"mode": "twin-contract", "n_keys": len(ckpt)}
    if args.auto_map:
        prop = propose_name_map(ckpt, cfg)
        report.update(
            mode="auto-map",
            n_mapped=len(prop["mapping"]),
            unmatched_twin=prop["unmatched_twin"],
            unmatched_foreign=prop["unmatched_foreign"],
            ambiguous=[list(p) for p in prop["ambiguous"]],
            complete=prop["complete"],
        )
        if prop["unmatched_twin"]:
            raise SystemExit(
                "[parity] auto-map incomplete — unmatched twin keys: "
                f"{prop['unmatched_twin'][:10]}"
            )
        if prop["ambiguous"] and not args.allow_ambiguous:
            raise SystemExit(
                "[parity] auto-map is order-ambiguous (same-signature "
                "units); verify the foreign net registers modules in "
                "data-flow order, then pass --allow-ambiguous:\n  "
                + "\n  ".join(f"{a} <-> {b}" for a, b in prop["ambiguous"][:10])
            )
        sd = {prop["mapping"][k]: v for k, v in ckpt.items() if k in prop["mapping"]}
    else:
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in ckpt.items()}
    variables = flax_from_torch_state(sd, cfg)
    return report, sd, variables


def _layer_stage(cfg, sd, variables, size: int, atol: float):
    """Per-layer activation diffs, torch twin vs flax (both f32, same input)."""
    import numpy as np
    import torch

    from tpucenterface.model.centernet import CenterFaceNet
    from tpucenterface.weights.torch_twin import TorchCenterFace

    twin = TorchCenterFace(cfg).eval()
    twin.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()
         if k in twin.state_dict()},
        strict=False,  # num_batches_tracked etc. may be absent
    )
    rng = np.random.RandomState(0)
    x = (rng.rand(1, size, size, 3).astype(np.float32) * 2.0) - 1.0

    # torch side: hook every module whose output is a single tensor
    t_acts: Dict[str, np.ndarray] = {}
    order: List[str] = []
    hooks = []
    for name, mod in twin.named_modules():
        if not name:
            continue

        def hook(m, inp, out, name=name):
            if isinstance(out, torch.Tensor):
                if name not in t_acts:
                    order.append(name)
                t_acts[name] = out.detach().numpy()

        hooks.append(mod.register_forward_hook(hook))
    with torch.no_grad():
        twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for h in hooks:
        h.remove()

    # flax side: capture every submodule __call__ output
    from flax.traverse_util import flatten_dict

    model = CenterFaceNet(cfg)
    _, state = model.apply(
        variables, x, train=False,
        capture_intermediates=True, mutable=["intermediates"],
    )
    j_acts: Dict[str, np.ndarray] = {}
    for path, val in flatten_dict(state["intermediates"]).items():
        if path[-1] != "__call__":
            continue
        out = val[0] if isinstance(val, tuple) else val
        if hasattr(out, "shape"):
            j_acts[".".join(path[:-1])] = np.asarray(out)

    rows = []
    worst = 0.0
    for name in order:
        if name not in j_acts:
            continue
        t = t_acts[name]
        j = j_acts[name]
        if t.ndim == 4:
            t = t.transpose(0, 2, 3, 1)
        if t.shape != j.shape:
            rows.append({"layer": name, "max_abs_diff": None,
                         "note": f"shape {t.shape} vs {j.shape}"})
            continue
        d = float(np.abs(j.astype(np.float64) - t.astype(np.float64)).max())
        worst = max(worst, d)
        rows.append({"layer": name, "max_abs_diff": round(d, 8)})
    return {
        "input_size": size,
        "n_layers_compared": sum(r["max_abs_diff"] is not None for r in rows),
        "worst_abs_diff": worst,
        "atol": atol,
        "pass": worst <= atol and bool(rows),
        "layers": rows,
    }, twin


def _boxes_stage(det, twin, cfg, images, size: int, k: int = 20):
    """Product-path boxes vs torch-reference-pipeline boxes per image."""
    import jax.numpy as jnp
    import numpy as np
    import torch

    from tpucenterface.decode.reference import (
        boxes_to_original,
        decode_feats_with_idx,
    )
    from tpucenterface.eval.wider_eval import bbox_overlaps
    from tpucenterface.preprocess import letterbox_normalize_batch

    per_image = []
    for img in images:
        h, w = img.shape[:2]
        ours = det.detect(img, score_thresh=-1.0, size=size)

        x, scales, pads = letterbox_normalize_batch(
            jnp.asarray(img[None]),
            jnp.asarray(np.array([[h, w]], np.int32)),
            size,
            det.config.preprocess,
            raw=False,
        )
        with torch.no_grad():
            t_out = twin(torch.from_numpy(
                np.asarray(x, np.float32).transpose(0, 3, 1, 2)
            ))
        feats = {kk: jnp.asarray(v.numpy().transpose(0, 2, 3, 1))
                 for kk, v in t_out.items()}
        boxes, scores, _ = decode_feats_with_idx(feats, det.config.decode)
        boxes = boxes_to_original(
            boxes[0], scales[0], pads[0], jnp.asarray([h, w], jnp.float32)
        )
        ref_b = np.asarray(boxes)
        ref_s = np.asarray(scores[0])

        kk = min(k, len(ref_s), len(ours.scores))
        a, b = ours.boxes[:kk], ref_b[:kk]
        # greedy best-IoU pairing (top-k order may differ on near-ties)
        iou = bbox_overlaps(a.astype(np.float64), b.astype(np.float64))
        matched = 0
        score_d = 0.0
        used = set()
        for i in range(kk):
            j = int(np.argmax(iou[i]))
            if iou[i, j] > 0.9 and j not in used:
                used.add(j)
                matched += 1
                score_d = max(
                    score_d, abs(float(ours.scores[i]) - float(ref_s[j]))
                )
        per_image.append({
            "hw": [h, w],
            "topk": kk,
            "match_frac": round(matched / max(kk, 1), 4),
            "max_score_delta_matched": round(score_d, 6),
        })
    worst = min((r["match_frac"] for r in per_image), default=0.0)
    return {"images": per_image, "worst_match_frac": worst}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Reference-checkpoint parity report (port + layers + "
        "boxes + optional WIDER AP)"
    )
    p.add_argument("--pth", required=True, help="reference .pth checkpoint")
    p.add_argument("--width-mult", type=float, default=1.0)
    p.add_argument("--with-landmarks", action="store_true")
    p.add_argument("--auto-map", action="store_true",
                   help="foreign module names: align by shape/order")
    p.add_argument("--allow-ambiguous", action="store_true")
    p.add_argument("--size", type=int, default=320,
                   help="model input size for the layer/boxes stages")
    p.add_argument("--atol", type=float, default=2e-3,
                   help="per-layer activation gate (head-map units)")
    p.add_argument("--min-box-match", type=float, default=0.9,
                   help="boxes-stage gate: min greedy-IoU>0.9 match "
                   "fraction over the top-k")
    p.add_argument("--images", nargs="*", default=None,
                   help="sample images for the boxes stage (default: 4 "
                   "synthesized multi-face scenes)")
    p.add_argument("--gt-dir", default=None,
                   help="WIDER eval_tools ground_truth dir -> adds AP stage")
    p.add_argument("--images-root", default=None, help="WIDER_val/images")
    p.add_argument("--tta", action="store_true",
                   help="AP stage: flip + multi-scale TTA")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--out", default=None, help="write the JSON report here")
    args = p.parse_args(argv)

    import numpy as np

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector

    # f32 compute end to end: this is the parity configuration (benchmark
    # config #1 is CPU/exactness, not throughput)
    cfg = ModelConfig(
        compute_dtype="float32",
        width_mult=args.width_mult,
        with_landmarks=args.with_landmarks,
    )
    report: Dict = {}

    report["port"], sd, variables = _port_stage(args, cfg)
    print(f"[parity] port: {report['port']['mode']}, "
          f"{report['port'].get('n_mapped', report['port']['n_keys'])} keys"
          + (", AMBIGUOUS units accepted" if report["port"].get("ambiguous")
             else ""))

    report["layers"], twin = _layer_stage(
        cfg, sd, variables, args.size, args.atol
    )
    print(f"[parity] layers: {report['layers']['n_layers_compared']} compared,"
          f" worst |diff| {report['layers']['worst_abs_diff']:.2e}"
          f" (atol {args.atol:g})"
          f" -> {'PASS' if report['layers']['pass'] else 'FAIL'}")

    det = Detector(
        variables=variables,
        config=DetectorConfig(model=cfg, default_size=args.size),
    )
    if args.images:
        import cv2

        images = []
        for path in args.images:
            img = cv2.imread(path)
            if img is None:
                raise SystemExit(f"[parity] cannot read {path}")
            images.append(img)
    else:
        from tpucenterface.data.synth import render_scene

        images = [
            render_scene(np.random.RandomState(100 + i), (360, 480))[0]
            for i in range(4)
        ]
    report["boxes"] = _boxes_stage(det, twin, cfg, images, args.size)
    report["boxes"]["min_box_match"] = args.min_box_match
    report["boxes"]["pass"] = (
        report["boxes"]["worst_match_frac"] >= args.min_box_match
    )
    print(f"[parity] boxes: worst top-k match {report['boxes']['worst_match_frac']:.3f}"
          f" over {len(images)} images"
          f" -> {'PASS' if report['boxes']['pass'] else 'FAIL'}")

    if args.gt_dir and args.images_root:
        from tpucenterface.eval.batch_runner import batched_detect, batched_detect_tta
        from tpucenterface.eval.wider_eval import evaluate_wider

        if args.tta:
            def batch_det_fn(imgs):
                return batched_detect_tta(det, imgs, score_thresh=0.01)
        else:
            def batch_det_fn(imgs):
                return batched_detect(det, imgs, score_thresh=0.01)

        aps = evaluate_wider(
            None, args.gt_dir, args.images_root,
            max_images=args.max_images, batch_det_fn=batch_det_fn,
        )
        report["ap"] = {k: round(float(v), 4) for k, v in aps.items()}
        print("[parity] AP: " + "  ".join(
            f"{k} {v:.4f}" for k, v in report["ap"].items()
        ))

    ok = report["layers"]["pass"] and report["boxes"]["pass"]
    report["pass"] = ok
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"[parity] report -> {args.out}")
    print(f"[parity] overall: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
