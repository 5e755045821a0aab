"""Model-zoo sweep: serving throughput per width preset (small/default/large).

Measures each preset's serving-profile program exactly as bench.py's
serving fields do — bs128 @640, identity preprocess (stem-baked
normalize), decode K=100, AUTO input layouts — in bf16 and, where
quantize() applies, int8_dw. One JSON line per preset.

    python -m tpucenterface.bench.preset_sweep [--presets small,default,large]

Same FIFO-bounded timing discipline as bench.py (block_until_ready is
unreliable over the axon relay); median-of-PASSES with [min, max] spread.
"""

import argparse
import json

import numpy as np


def _median(fn, im, hw, b, n, passes):
    from tpucenterface.bench.timing import fifo_ips_passes, median_spread

    return median_spread(fifo_ips_passes(fn, im, hw, b, n, passes))


def sweep_preset(name: str, side=640, dev_b=128, iters=100, passes=3) -> dict:
    from tpucenterface.config import preset
    from tpucenterface.detector import Detector, stage_inputs

    import jax

    det = Detector(config=preset(name))
    n_params = sum(
        int(np.prod(v.shape)) for v in jax.tree.leaves(det.variables)
    )
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (dev_b, side, side, 3), np.uint8)
    hws = np.tile(np.array([[side, side]], np.int32), (dev_b, 1))

    def serving_vals():
        fn, fmts = det._batch_fn_auto(
            dev_b, (side, side), side, identity=True, max_dets=100
        )
        im, hw = stage_inputs(fmts, imgs, hws)
        return _median(fn, im, hw, dev_b, iters, passes)

    bf16, bf16_spread = serving_vals()
    int8 = int8_spread = None
    try:
        det.quantize(calib_images=imgs[:8], int8_dw=True, size=side)
        int8, int8_spread = serving_vals()
    except Exception as e:  # guarded like bench.py: bf16 number survives
        import sys

        print(f"# {name}: int8 sweep skipped: {e}", file=sys.stderr)
    finally:
        det.dequantize()
    return {
        "preset": name,
        "params": n_params,
        "serving_bf16_img_s": bf16,
        "serving_bf16_spread": bf16_spread,
        "serving_int8_img_s": int8,
        "serving_int8_spread": int8_spread,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description="width-preset serving sweep")
    p.add_argument("--presets", default="small,default,large")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--passes", type=int, default=3)
    args = p.parse_args(argv)
    for name in args.presets.split(","):
        print(
            json.dumps(
                sweep_preset(
                    name.strip(), iters=args.iters, passes=args.passes
                )
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
