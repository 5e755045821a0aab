"""Headline benchmark: images/sec/chip, 640x640 bs=32, fused pipeline (config #2).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the driver.
vs_baseline is value / 5000 (BASELINE.json north star: >=5,000 img/s/chip on
v5e). Runs on whatever jax.default_backend() provides — the real TPU chip
under the driver. The full 5-config suite lives in tpucenterface/bench/.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpucenterface.config import DetectorConfig
    from tpucenterface.detector import Detector

    batch, side = 32, 640
    det = Detector(config=DetectorConfig())

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (batch, side, side, 3), np.uint8)
    hws = np.tile(np.array([[side, side]], np.int32), (batch, 1))
    fn = det._batch_fn(batch, (side, side), side)

    j_imgs = jnp.asarray(imgs)
    j_hws = jnp.asarray(hws)

    def fifo_ips(fn_, im, hw, b, n):
        """Enqueue n launches, fetch one scalar of the LAST result: device
        execution is FIFO so that bounds all prior work (block_until_ready
        is unreliable over the axon relay). Warmup/compile included once."""
        _, scores = fn_(im, hw)
        float(np.asarray(scores).sum())
        t0 = time.perf_counter()
        for _ in range(n):
            _, scores = fn_(im, hw)
        float(np.asarray(scores).sum())
        return b * n / (time.perf_counter() - t0)

    # 100 enqueued batches: at 30 the run-constant costs (first dispatches
    # through the relay) depress the steady-state rate by ~5%
    iters = int(os.environ.get("BENCH_ITERS", "100"))
    ips = fifo_ips(fn, j_imgs, j_hws, batch, iters)

    # Serving mode: the same bs32 request stream dynamically coalesced into
    # bs128 device programs (tpucenterface/runtime/serving.py) — the measured
    # production path past the bs32 emitter wall (PERFORMANCE.md: ~7ms of the
    # bs32 program is batch-size-independent XLA conv-emitter lane fill;
    # every structural fix inside a bs32 program probed + measured closed).
    # Reported as an extra field; `value` stays the contract-literal bs32
    # program throughput.
    dev_b = 128
    j_imgs128 = jnp.asarray(np.tile(np.asarray(imgs), (dev_b // batch, 1, 1, 1)))
    j_hws128 = jnp.asarray(np.tile(hws, (dev_b // batch, 1)))
    iters128 = max(1, (iters * batch) // dev_b)
    serving_ips = fifo_ips(
        det._batch_fn(dev_b, (side, side), side),
        j_imgs128, j_hws128, dev_b, iters128,
    )

    # opt-in W8A8 serving forward (Detector.quantize): loses at bs32, wins
    # at bs>=128 where the int8 MXU rate dominates the unfused q/dq chains
    # (measured ledger in PERFORMANCE.md; accuracy ~1% of head-map range,
    # NOT the parity path). Guarded: the headline JSON must survive an int8
    # failure on any backend.
    serving_int8_ips = None
    try:
        det.quantize(calib_images=imgs[:8])
        serving_int8_ips = fifo_ips(
            det._batch_fn(dev_b, (side, side), side),
            j_imgs128, j_hws128, dev_b, iters128,
        )
    except Exception as e:
        print(f"# int8 serving measurement skipped: {e}", file=sys.stderr)
    finally:
        det.dequantize()

    print(
        json.dumps(
            {
                "metric": "images/sec/chip @640x640 bs32 fused",
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": round(ips / 5000.0, 4),
                "serving_coalesced_img_s": round(serving_ips, 2),
                "serving_int8_img_s": (
                    round(serving_int8_ips, 2)
                    if serving_int8_ips is not None
                    else None
                ),
                "serving_note": "bs32 request stream dynamically coalesced "
                "to bs128 device programs (runtime/serving.py); same fused "
                "pipeline, measured with the same FIFO barrier; int8 = "
                "opt-in W8A8 PTQ serving forward (Detector.quantize)",
            }
        )
    )


if __name__ == "__main__":
    main()
