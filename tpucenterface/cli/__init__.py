"""Command-line apps (SURVEY.md §1 L6: train.py / test_wider / demo / export).

Run as modules from the repo root:
    python -m tpucenterface.cli.demo --source video.mp4 --weights w.safetensors
    python -m tpucenterface.cli.train --wider-root /data/WIDER --workdir runs/x
    python -m tpucenterface.cli.eval_wider --gt-dir eval_tools/ground_truth ...
    python -m tpucenterface.cli.port_weights --pth model.pth --out w.safetensors
    python -m tpucenterface.cli.bench_suite  # the 5 BASELINE configs
"""
