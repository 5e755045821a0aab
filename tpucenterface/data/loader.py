"""Training batch pipeline: augment + render targets + stack
(SURVEY.md §2 C7/C9 [K]: replaces the torch Dataset/DataLoader pair).

A plain generator on purpose: batches flow through
`runtime.prefetch.prefetch_to_device`, which overlaps the host work here with
device compute — the role DataLoader workers play in the reference. For
multi-process scaling, wrap `build_sample` in a `multiprocessing.Pool`.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import cv2
import numpy as np

from tpucenterface.config import TrainConfig
from tpucenterface.data.augment import augment_train
from tpucenterface.data.targets import make_targets
from tpucenterface.data.wider import WiderImage


def build_sample(
    rec: WiderImage,
    cfg: TrainConfig,
    rng: np.random.RandomState,
    wh_log: bool = False,
    img: Optional[np.ndarray] = None,
) -> Optional[Dict[str, np.ndarray]]:
    """Load + augment one record into a training sample (None if unreadable)."""
    if img is None:
        img = cv2.imread(rec.path)
        if img is None:
            return None
    boxes = rec.xyxy[~rec.invalid] if len(rec.boxes) else rec.xyxy
    canvas, boxes = augment_train(img, boxes, cfg, rng)
    t = make_targets(
        boxes, cfg.input_size, stride=4, max_objs=cfg.max_objs, wh_log=wh_log
    )
    t["image"] = canvas  # uint8; normalization is device-side in train.step
    return t


def batch_iterator(
    records: Sequence[WiderImage],
    cfg: TrainConfig,
    seed: int = 0,
    epochs: Optional[int] = None,
    drop_last: bool = True,
    wh_log: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Shuffled epoch iterator yielding stacked numpy batches."""
    rng = np.random.RandomState(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(records))
        buf: List[Dict[str, np.ndarray]] = []
        for idx in order:
            s = build_sample(records[idx], cfg, rng, wh_log=wh_log)
            if s is None:
                continue
            buf.append(s)
            if len(buf) == cfg.batch_size:
                yield _stack(buf)
                buf = []
        if buf and not drop_last:
            yield _stack(buf)
        epoch += 1


def _stack(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}
