"""Decode: sigmoid -> 3x3 maxpool pseudo-NMS -> top-k -> gather (SURVEY.md §2 C4).

Two interchangeable implementations:
- `reference.decode_feats` — pure-jnp golden decode (XLA-fused, also the
  property-test oracle).
- `pallas_decode.decode_feats_pallas` — single fused Pallas TPU kernel
  (sigmoid + peak mask + block top-k + cross-block merge + gather).
"""

from tpucenterface.decode.reference import decode_feats, boxes_to_original

__all__ = ["decode_feats", "boxes_to_original"]
