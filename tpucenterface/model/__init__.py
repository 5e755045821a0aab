"""NHWC flax model: MobileNetV2-class backbone -> FPN-lite neck -> CenterNet heads.

Capability parity with SURVEY.md §2 C1 (backbone), C2 (neck), C3 (heads);
designed TPU-first (NHWC, bf16 conv path, f32 heads) rather than ported.
"""

from tpucenterface.model.backbone import MobileNetV2Backbone
from tpucenterface.model.centernet import CenterFaceNet, init_model
from tpucenterface.model.heads import CenterNetHeads
from tpucenterface.model.neck import FPNLiteNeck

__all__ = [
    "MobileNetV2Backbone",
    "FPNLiteNeck",
    "CenterNetHeads",
    "CenterFaceNet",
    "init_model",
]
