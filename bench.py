"""Headline benchmark: images/sec/chip, 640x640 bs=32, fused pipeline (config #2).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the driver.
vs_baseline is value / 5000 (BASELINE.json north star: >=5,000 img/s/chip on
v5e). Runs on whatever jax.default_backend() provides — the real TPU chip
under the driver. The full 5-config suite lives in tpucenterface/bench/.

All headline fields are the MEDIAN of N passes with the min-max spread
reported next to them (run-to-run spread on serving numbers is ~±2%;
VERDICT r2 #8: deltas smaller than the spread must be attributable).
"""

import json
import os
import sys

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

    # the canonical FIFO-bounded measurement (warm once, median-of-passes)
    # — shared with cli/bench_suite.py and bench/preset_sweep.py so the
    # method cannot drift between benchmarks
    from tpucenterface.bench.timing import fifo_ips_passes as median_ips
    from tpucenterface.bench.timing import median_spread

    def stats(vals):
        return median_spread(vals, ndigits=2)

    # contract-literal bs32 @640 program (100 enqueued batches per pass: at
    # 30 the run-constant relay dispatch costs depress steady state by ~5%)
    iters = int(os.environ.get("BENCH_ITERS", "100"))
    passes = int(os.environ.get("BENCH_PASSES", "5"))
    fn = det._batch_fn(batch, (side, side), side)
    j_imgs = jnp.asarray(imgs)
    j_hws = jnp.asarray(hws)
    ips, ips_spread = stats(median_ips(fn, j_imgs, j_hws, batch, iters, passes))

    # Serving mode: the same bs32 request stream dynamically coalesced into
    # bs128 device programs (tpucenterface/runtime/serving.py) — the measured
    # production path past the bs32 emitter wall (PERFORMANCE.md: ~7ms of the
    # bs32 program is batch-size-independent XLA conv-emitter lane fill;
    # every structural fix inside a bs32 program probed + measured closed).
    # Measured exactly as the ServingEngine launches it for pre-sized frames:
    # identity preprocess (stem_bake carries the normalize), serving decode
    # profile K=100, AUTO parameter layouts (inputs staged in the program's
    # preferred layout, as ServingEngine._launch_inner stages them).
    # Reported as extra fields; `value` stays the contract-literal bs32
    # program throughput.
    dev_b, serve_k = 128, 100
    imgs128 = np.tile(imgs, (dev_b // batch, 1, 1, 1))
    hws128 = np.tile(hws, (dev_b // batch, 1))
    # floor of 200 enqueued launches: a serving pipeline runs continuously,
    # so the fully-amortized rate is the honest one. Measured r5 (pipelining
    # depth probe, PERFORMANCE.md): 100 launches/pass reads 4,641 img/s,
    # 200 -> 4,669, 400 -> 4,679, asymptoting on the per-section floor
    # table's 27.24 ms device ceiling (4,699) — the residue is per-launch
    # relay dispatch, amortized away by depth. 200 keeps the last ~0.2%
    # on the table to bound pass runtime.
    iters128 = max(200, (iters * batch) // dev_b)

    def serving_fn_and_args():
        from tpucenterface.detector import stage_inputs

        fn_, fmts = det._batch_fn_auto(
            dev_b, (side, side), side, identity=True, max_dets=serve_k
        )
        im, hw = stage_inputs(fmts, imgs128, hws128)
        return fn_, im, hw

    def serving_vals():
        fn_, im, hw = serving_fn_and_args()
        return median_ips(fn_, im, hw, dev_b, iters128, passes)

    def serving_roofline(int8_mode: bool):
        """Whole-program MFU/HBM-roofline of the CURRENT serving program
        (VERDICT r3 #4: makes the 'remaining ms are at measured floors'
        claims machine-checkable round over round). Guarded — the headline
        JSON must survive a missing profiler converter."""
        try:
            from tpucenterface.bench.roofline import roofline_of_fn

            fn_, im, hw = serving_fn_and_args()
            # this IS the canonical serving shape (bs128 @640, identity
            # staging, K=100) the ledger's recorded floors were measured on
            return roofline_of_fn(
                fn_, (im, hw), iters=3, int8=int8_mode,
                recorded_floors=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"# roofline capture skipped: {e}", file=sys.stderr)
            return None

    serving_ips, serving_spread = stats(serving_vals())
    rl_bf16 = serving_roofline(int8_mode=False)

    # opt-in W8A8 serving forward (Detector.quantize): loses at bs32, wins
    # at bs>=128 where the int8 MXU rate dominates (measured ledger in
    # PERFORMANCE.md). int8_dw=True: depthwise convs int8 too, with
    # per-channel activation scales; task-level accuracy anchored to the
    # committed flagship artifact (tests/test_flagship_anchor.py — int8_dw
    # within 0.008 AP of float, PERFORMANCE.md r5 pins table; the 96px toy
    # pin in tests/test_integration.py remains as a fast smoke test). NOT
    # the parity path. Guarded: the headline JSON must survive an int8
    # failure on any backend.
    serving_int8 = serving_int8_spread = None
    serving_int8in = serving_int8in_spread = None
    rl_int8 = None
    try:
        det.quantize(calib_images=imgs[:8], int8_dw=True)
        serving_int8, serving_int8_spread = stats(serving_vals())
        rl_int8 = serving_roofline(int8_mode=True)
        # int8-INPUT variant: host-quantized staging (the stem's device-
        # exact u8->s8 LUT applied during assembly — ServingEngine
        # int8_input mode) removes the program's input quantize pass and
        # shrinks its retiling copy. Device program rate; the host LUT cost
        # (~1 core-second per 2-3 GB, threaded C++) rides the staging
        # pipeline on multi-core serving hosts.
        try:
            from tpucenterface.detector import stage_inputs
            from tpucenterface.quant.engine import apply_stem_lut

            lut = det.stem_input_lut()
            i8 = apply_stem_lut(imgs128, lut)
            fn_i8, fmts = det._batch_fn_auto(
                dev_b, (side, side), side, identity=True,
                max_dets=serve_k, int8_in=True,
            )
            im_i8, hw_i8 = stage_inputs(fmts, i8, hws128)
            serving_int8in, serving_int8in_spread = stats(
                median_ips(fn_i8, im_i8, hw_i8, dev_b, iters128, passes)
            )
        except Exception as e:  # noqa: BLE001
            print(f"# int8-input measurement skipped: {e}", file=sys.stderr)
    except Exception as e:
        print(f"# int8 serving measurement skipped: {e}", file=sys.stderr)
    finally:
        det.dequantize()

    print(
        json.dumps(
            {
                "metric": "images/sec/chip @640x640 bs32 fused",
                "value": ips,
                "unit": "img/s",
                "vs_baseline": round(ips / 5000.0, 4),
                "value_spread": ips_spread,
                "serving_coalesced_img_s": serving_ips,
                "serving_coalesced_spread": serving_spread,
                "serving_int8_img_s": serving_int8,
                "serving_int8_spread": serving_int8_spread,
                "serving_int8_vs_baseline": (
                    round(serving_int8 / 5000.0, 4)
                    if serving_int8 is not None
                    else None
                ),
                "serving_int8in_img_s": serving_int8in,
                "serving_int8in_spread": serving_int8in_spread,
                # machine-checkable floor claims (VERDICT r3 #4): whole-
                # program achieved TFLOP/s, MFU vs this chip's MEASURED
                # peaks (190 TFLOP/s bf16 / 350 TOPS int8), achieved HBM
                # TB/s and fraction of the measured 0.65 TB/s roofline
                # (bench/roofline.py reduces the op_profile xplane data)
                "serving_mfu": rl_bf16["mfu"] if rl_bf16 else None,
                "serving_hbm_frac": rl_bf16["hbm_frac"] if rl_bf16 else None,
                "serving_roofline": rl_bf16,
                # per-section ms + floor ratios (VERDICT r4 #5): conv /
                # input / decode / neck device ms, each with its naive
                # per-op roofline floor (MXU-or-VPU compute vs HBM, the
                # larger) and — where the ledger recorded one — the
                # demonstrated floor; a regression names its section here
                "serving_sections": (
                    rl_bf16.get("sections") if rl_bf16 else None
                ),
                "serving_int8_sections": (
                    rl_int8.get("sections") if rl_int8 else None
                ),
                "serving_int8_mfu": rl_int8["mfu"] if rl_int8 else None,
                "serving_int8_hbm_frac": (
                    rl_int8["hbm_frac"] if rl_int8 else None
                ),
                "serving_int8_roofline": rl_int8,
                "serving_note": "bs32 request stream dynamically coalesced "
                "to bs128 device programs (runtime/serving.py) exactly as "
                "ServingEngine launches them: identity preprocess "
                "(stem-baked normalize), decode K=100 serving profile, AUTO "
                "input layouts; int8 = opt-in W8A8 PTQ forward with "
                "per-channel int8 depthwise (Detector.quantize(int8_dw)), "
                "AP measured within 0.008 of float on the trained flagship "
                "model (PERFORMANCE.md r5 pins table; anchored by "
                "tests/test_flagship_anchor.py); "
                "int8in = ServingEngine int8_input mode (host-side "
                "device-exact LUT staging, bit-identical results); "
                "all fields median-of-%d passes with [min,max] spread"
                % passes,
            }
        )
    )


if __name__ == "__main__":
    main()
