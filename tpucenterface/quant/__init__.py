"""Post-training int8 quantization for the inference path.

v5e's MXU runs int8 at ~2x bf16 throughput (measured 350 TOPS vs 189
TFLOP/s). `QuantEngine` executes the BN-folded network with W8A8 matmul-class
convs (1x1 expand/project, stem, neck, heads-hidden) and keeps VPU-bound
depthwise convs + head outputs + decode in bf16/f32 — the layers where int8
wins nothing but costs accuracy.

Workflow:
    eng = QuantEngine(folded_variables, model_cfg)
    eng.calibrate(sample_batches)     # per-layer activation amax -> scales
    feats = eng(x)                    # quantized forward
"""

from tpucenterface.quant.adaround import adaround
from tpucenterface.quant.engine import QuantEngine
from tpucenterface.quant.qat import qat_finetune

__all__ = ["QuantEngine", "adaround", "qat_finetune"]
