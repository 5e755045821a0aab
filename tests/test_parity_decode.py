"""End-to-end parity: torch twin + torch ctdet decode vs the JAX pipeline.

Extends the head-map parity (test_parity.py) to FINAL boxes/scores — the
actual `detect()` contract ("reproduce the original detector's boxes and
scores within float tolerance", BASELINE north-star). The torch decode below
implements the canonical reference chain (maxpool NMS -> topk -> gather) in
torch ops, independent of any JAX code.
"""

import numpy as np
import torch
import torch.nn.functional as F

from tpucenterface.config import DecodeConfig, ModelConfig
from tpucenterface.decode.reference import decode_feats
from tpucenterface.model.centernet import CenterFaceNet
from tpucenterface.weights.port import flax_from_torch_module
from tpucenterface.weights.torch_twin import TorchCenterFace

CFG = ModelConfig(compute_dtype="float32")


def torch_ctdet_decode(out, k=100, stride=4):
    """Canonical torch CenterNet decode (NCHW): boxes (B,K,4), scores (B,K)."""
    hm = torch.sigmoid(out["hm"])
    hmax = F.max_pool2d(hm, 3, stride=1, padding=1)
    peaks = torch.where(hmax == hm, hm, torch.zeros_like(hm))
    b, _, h, w = peaks.shape
    flat = peaks.view(b, -1)
    scores, idx = torch.topk(flat, k)
    ys = (idx // w).float()
    xs = (idx % w).float()
    wh = out["wh"].view(b, 2, -1)
    off = out["off"].view(b, 2, -1)
    whg = torch.gather(wh, 2, idx.unsqueeze(1).expand(b, 2, k))
    offg = torch.gather(off, 2, idx.unsqueeze(1).expand(b, 2, k))
    cx = xs + offg[:, 0]
    cy = ys + offg[:, 1]
    bw = torch.clamp(whg[:, 0], min=0)
    bh = torch.clamp(whg[:, 1], min=0)
    boxes = torch.stack(
        [
            (cx - bw / 2) * stride,
            (cy - bh / 2) * stride,
            (cx + bw / 2) * stride,
            (cy + bh / 2) * stride,
        ],
        dim=-1,
    )
    return boxes, scores


def test_full_detect_parity_torch_vs_jax():
    torch.manual_seed(7)
    twin = TorchCenterFace(CFG).eval()
    variables = flax_from_torch_module(twin, CFG)
    model = CenterFaceNet(CFG)

    rng = np.random.RandomState(3)
    x = rng.rand(2, 128, 128, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        t_out = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    t_boxes, t_scores = torch_ctdet_decode(t_out, k=50)

    import jax

    feats = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, x)
    j_boxes, j_scores = decode_feats(feats, DecodeConfig(max_dets=50))

    t_s = t_scores.numpy()
    j_s = np.asarray(j_scores)
    np.testing.assert_allclose(j_s, t_s, atol=2e-4)
    # Boxes: with random weights the sigmoid saturates, so many scores tie
    # within float tolerance and the two frameworks may order tied peaks
    # differently. Compare as SETS: every jax detection must have a torch
    # detection at the same location (IoU > 0.9).
    from tpucenterface.eval.wider_eval import bbox_overlaps

    t_b = t_boxes.numpy()
    j_b = np.asarray(j_boxes)
    for bi in range(j_b.shape[0]):
        iou = bbox_overlaps(j_b[bi].astype(np.float64), t_b[bi].astype(np.float64))
        matched = (iou.max(axis=1) > 0.9).mean()
        assert matched >= 0.9, f"batch {bi}: only {matched:.0%} matched"


def test_torch_decode_agrees_on_synthetic_peaks():
    """Decode-only parity on hand-built maps (no model in the loop)."""
    rng = np.random.RandomState(0)
    hm = rng.randn(1, 12, 12, 1).astype(np.float32) * 3
    wh = (rng.rand(1, 12, 12, 2) * 5).astype(np.float32)
    off = (rng.rand(1, 12, 12, 2) - 0.5).astype(np.float32)
    feats = {"hm": hm, "wh": wh, "off": off}
    j_boxes, j_scores = decode_feats(
        {k: np.asarray(v) for k, v in feats.items()}, DecodeConfig(max_dets=20)
    )
    t_out = {
        "hm": torch.from_numpy(hm.transpose(0, 3, 1, 2)),
        "wh": torch.from_numpy(wh.transpose(0, 3, 1, 2)),
        "off": torch.from_numpy(off.transpose(0, 3, 1, 2)),
    }
    t_boxes, t_scores = torch_ctdet_decode(t_out, k=20)
    np.testing.assert_allclose(np.asarray(j_scores), t_scores.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(j_boxes), t_boxes.numpy(), atol=1e-4)
