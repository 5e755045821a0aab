"""Data layer: WIDER FACE parsing, augmentation, CenterNet target rendering
(SURVEY.md §2 C7, §1 L1).

Host-side numpy/OpenCV by design — the reference renders targets in
DataLoader workers; we do the same in the input pipeline, keeping the TPU fed
via the double-buffered prefetch in `runtime.prefetch`.
"""
