"""End-to-end integration: train -> detect -> WIDER-protocol AP
(SURVEY.md §4 item 3: small-subset end-to-end check).

A tiny model overfits ~40 synthetic 'faces' (bright boxes on noise); the
full product loop then must find them: device letterbox -> forward ->
decode -> inverse transform -> AP via the eval protocol.
"""

import cv2
import numpy as np
import pytest

from tpucenterface.config import (
    DecodeConfig,
    DetectorConfig,
    ModelConfig,
    TrainConfig,
)
from tpucenterface.data.wider import WiderImage

TINY = ModelConfig(
    inverted_residual_setting=(
        (1, 8, 1, 1),
        (4, 16, 1, 2),
        (4, 16, 1, 2),
        (4, 24, 1, 2),
        (4, 24, 1, 1),
        (4, 32, 1, 2),
        (4, 32, 1, 1),
    ),
    stem_channels=8,
    fpn_channels=16,
    head_conv=16,
    compute_dtype="float32",
)


def _synth_image(rng, size=96):
    img = rng.randint(0, 60, (size, size, 3), np.uint8)
    w, h = rng.randint(24, 40), rng.randint(24, 40)
    x1 = rng.randint(4, size - w - 4)
    y1 = rng.randint(4, size - h - 4)
    img[y1 : y1 + h, x1 : x1 + w] = (210, 180, 160)  # face-ish blob
    cv2.circle(img, (x1 + w // 3, y1 + h // 3), 2, (30, 30, 30), -1)
    cv2.circle(img, (x1 + 2 * w // 3, y1 + h // 3), 2, (30, 30, 30), -1)
    return img, np.array([[x1, y1, w, h]], np.float32)


@pytest.mark.slow
def test_train_detect_eval_loop(tmp_path):
    rng = np.random.RandomState(0)
    records = []
    for i in range(40):
        img, boxes = _synth_image(rng)
        p = str(tmp_path / f"s_{i}.jpg")
        cv2.imwrite(p, img)
        real = cv2.imread(p)  # jpeg round trip for realism
        records.append(
            WiderImage(p, f"ev/s_{i}.jpg", boxes, np.array([False]))
        )

    tcfg = TrainConfig(
        input_size=96,
        batch_size=8,
        lr=2e-3,
        max_objs=4,
        scale_range=(0.9, 1.1),
        shift_ratio=0.05,
        color_jitter=0.1,
    )
    from tpucenterface.train.loop import train

    state = train(
        records,
        model_cfg=TINY,
        train_cfg=tcfg,
        workdir=str(tmp_path / "run"),
        max_steps=150,
        ckpt_every=0,
        log_every=50,
        log_fn=lambda s, m: None,
    )

    from tpucenterface.detector import Detector
    from tpucenterface.weights.io import load_safetensors

    variables = load_safetensors(str(tmp_path / "run/model.safetensors"))
    det = Detector(
        variables=variables,
        config=DetectorConfig(
            model=TINY,
            decode=DecodeConfig(max_dets=20),
            default_size=96,
        ),
    )

    from tpucenterface.eval.wider_eval import evaluate_detections

    dets, gts, keeps = [], [], []
    hits = 0
    for i in range(10):
        img, boxes = _synth_image(np.random.RandomState(1000 + i))
        gt = boxes.copy()
        gt[:, 2:4] += gt[:, 0:2]
        b, s = det.detect(img, score_thresh=0.05)[:2]
        dets.append(
            np.concatenate([b.reshape(-1, 4), s.reshape(-1, 1)], axis=1)
        )
        gts.append(gt.astype(np.float64))
        keeps.append(np.ones(1, bool))
        if len(b):
            ix1 = np.maximum(b[:, 0], gt[0, 0])
            iy1 = np.maximum(b[:, 1], gt[0, 1])
            ix2 = np.minimum(b[:, 2], gt[0, 2])
            iy2 = np.minimum(b[:, 3], gt[0, 3])
            inter = np.maximum(0, ix2 - ix1) * np.maximum(0, iy2 - iy1)
            a1 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            a2 = (gt[0, 2] - gt[0, 0]) * (gt[0, 3] - gt[0, 1])
            iou = inter / np.maximum(a1 + a2 - inter, 1e-9)
            hits += int(iou.max() >= 0.5)

    ap = evaluate_detections(dets, gts, keeps)
    assert hits >= 6, f"detector found {hits}/10 synthetic faces (IoU>=0.5)"
    assert ap >= 0.4, f"AP {ap}"

    # Task-level accuracy of the opt-in W8A8 serving forward on a TRAINED
    # model: the int8 AP must track the float AP (quantifies the PTQ cost
    # at the metric that matters, not just head-map deltas).
    calib = np.stack(
        [_synth_image(np.random.RandomState(2000 + i))[0] for i in range(8)]
    )
    det.quantize(calib_images=calib)
    try:
        dets_q = []
        for i in range(10):
            img, boxes = _synth_image(np.random.RandomState(1000 + i))
            b, s = det.detect(img, score_thresh=0.05)[:2]
            dets_q.append(
                np.concatenate([b.reshape(-1, 4), s.reshape(-1, 1)], axis=1)
            )
        ap_q = evaluate_detections(dets_q, gts, keeps)
    finally:
        det.dequantize()
    assert ap_q >= ap - 0.1, f"int8 AP {ap_q} vs float AP {ap}"

    # int8_dw (per-channel depthwise activation scales): the serving
    # headline flag (VERDICT r2 task-1 lever e) carries the SAME AP pin —
    # any quant path that serves must hold task-level accuracy.
    det.quantize(calib_images=calib, int8_dw=True)
    try:
        dets_dw = []
        for i in range(10):
            img, boxes = _synth_image(np.random.RandomState(1000 + i))
            b, s = det.detect(img, score_thresh=0.05)[:2]
            dets_dw.append(
                np.concatenate([b.reshape(-1, 4), s.reshape(-1, 1)], axis=1)
            )
        ap_dw = evaluate_detections(dets_dw, gts, keeps)
    finally:
        det.dequantize()
    assert ap_dw >= ap - 0.1, f"int8_dw AP {ap_dw} vs float AP {ap}"

    # QAT on a TRAINED model (the setting the product claim is about —
    # random-weight PTQ error is near-unstructured noise, trained-model
    # error has the systematic component QAT removes): fine-tune must
    # measurably shrink the real-path head-map loss AND hold the AP pin.
    det.quantize(calib_images=calib, int8_dw=True, qat_steps=15)
    try:
        m = det.last_qat_metrics
        assert m is not None and m["loss_last"] < m["loss_first"], m
        dets_qat = []
        for i in range(10):
            img, boxes = _synth_image(np.random.RandomState(1000 + i))
            b, s = det.detect(img, score_thresh=0.05)[:2]
            dets_qat.append(
                np.concatenate([b.reshape(-1, 4), s.reshape(-1, 1)], axis=1)
            )
        ap_qat = evaluate_detections(dets_qat, gts, keeps)
    finally:
        det.dequantize()
    assert ap_qat >= ap - 0.1, f"QAT int8 AP {ap_qat} vs float AP {ap}"
