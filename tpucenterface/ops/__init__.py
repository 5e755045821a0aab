"""Hand-written Pallas TPU kernels for the hot ops (SURVEY.md §7, PAPERS.md).

- fused_mbconv: whole inverted-residual block (1x1 expand -> 3x3 depthwise ->
  1x1 project -> skip) in one kernel. XLA cannot fuse conv->conv, so the
  6x-expanded intermediate tensors of MobileNetV2 blocks round-trip HBM at
  every block — at 640x640 bs32 those high-resolution blocks are the measured
  majority of forward time. This kernel keeps the expanded tensor in VMEM:
  HBM traffic drops to input + output only.
"""

from tpucenterface.ops.fused_mbconv import fused_mbconv

__all__ = ["fused_mbconv"]
