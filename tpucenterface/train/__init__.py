"""Training substrate: losses, targets, train step, loop (SURVEY.md §2 C7-C10).

Inference-first per [B]; training exists for capability parity with the
reference's train.py and to regenerate weights. The train step is a single
jitted program designed for DP sharding over a `jax.sharding.Mesh` (GSPMD
inserts the gradient psum — no hand-written collectives needed).
"""
