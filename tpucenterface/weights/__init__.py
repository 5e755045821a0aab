"""Weight porting and checkpoint IO (SURVEY.md §2 C10, §5 checkpoint/resume).

- `torch_twin`  — a torch-CPU mirror of the flax architecture, used to (a)
  generate golden activations for parity tests (SURVEY.md §4 item 1) and (b)
  document the exact torch layout reference checkpoints load into.
- `port`        — torch state_dict -> flax {params, batch_stats} (OIHW->HWIO).
- `io`          — safetensors save/load of the flax variables; quant-scale
  JSON persistence; packed low-bit deployment artifacts
  (save_packed_weights/load_packed_weights).
"""
