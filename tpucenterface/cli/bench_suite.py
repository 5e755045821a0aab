"""The 5 BASELINE benchmark configs (BASELINE.md; SURVEY.md §6).

Prints one JSON line per config. Configs needing the WIDER dataset fall back
to synthetic images when --wider-root is absent (throughput numbers remain
meaningful; AP requires the dataset).

Timing note: block_until_ready is unreliable over the axon relay; every
measurement fetches a scalar/array from the LAST enqueued result, which is a
sound completion barrier because device execution is FIFO.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _barrier(x):
    return float(np.asarray(x).sum())


def _fifo_ips(fn, im, hw, batch, iters):
    """Shared FIFO-bounded rate (bench.timing.fifo_ips): warm/compile,
    enqueue `iters` launches, barrier on the LAST result -> images/sec."""
    from tpucenterface.bench.timing import fifo_ips

    return fifo_ips(fn, im, hw, batch, iters)


def config1_single_320(det) -> dict:
    """Single 320x320 image forward + decode latency (parity config).

    Reports BOTH the wall latency (through whatever link carries the arrays —
    under the axon relay that is ~2 RTTs of tunnel time) and the device-true
    per-call time from the slope method (bench.timing.op_time_ms), so future
    rounds can regression-test the program itself (VERDICT r1 #5)."""
    import jax.numpy as jnp

    from tpucenterface.bench.timing import op_time_ms

    img = np.random.RandomState(0).randint(0, 255, (320, 320, 3), np.uint8)
    det.detect(img, size=320)  # compile
    n = 20
    lats = []
    for _ in range(n):
        t0 = time.perf_counter()
        boxes, scores = det.detect(img, size=320)[:2]
        lats.append(time.perf_counter() - t0)
    wall_p50 = float(np.median(lats)) * 1e3

    fn = det._single_fn(img.shape[:2], 320)
    imgs_f = jnp.asarray(np.random.RandomState(1).rand(320, 320, 3) * 255,
                         jnp.float32)
    hw = jnp.array([320, 320], jnp.int32)
    device_ms = op_time_ms(
        lambda x: fn(x.astype(jnp.uint8), hw), imgs_f, k_pair=(4, 16)
    )
    return {"metric": "p50 latency single 320x320", "value": round(wall_p50, 2),
            "unit": "ms", "tunnel_ms": round(wall_p50, 2),
            "device_ms": round(device_ms, 3)}


def config2_batch640(det, batch=32) -> dict:
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (batch, 640, 640, 3), np.uint8))
    hws = jnp.asarray(np.tile(np.array([[640, 640]], np.int32), (batch, 1)))
    n = 100  # steady state; run-constant dispatch costs bias short runs low
    ips = _fifo_ips(det._batch_fn(batch, (640, 640), 640), imgs, hws, batch, n)

    # Serving mode: the SAME bs32 request stream dynamically coalesced into
    # bs128 device programs (runtime/serving.ServingEngine) — the measured
    # production path past the bs32 emitter wall (PERFORMANCE.md). Reported
    # two ways, per the suite's tunnel/device convention:
    #  - device img/s: staged inputs through the coalesced bs128 program
    #    (what a co-located serving host sees);
    #  - wall img/s: fresh host data per request, which under the axon relay
    #    is bounded by shipping ~157MB/launch through the ~0.5GB/s tunnel.
    dev_b = 128
    imgs128_np = rng.randint(0, 255, (dev_b, 640, 640, 3), np.uint8)
    hws128_np = np.tile(np.array([[640, 640]], np.int32), (dev_b, 1))
    n128 = max(100, (n * batch) // dev_b)
    # the exact program ServingEngine launches for pre-sized frames:
    # identity preprocess (stem-baked normalize), serving decode K=100,
    # AUTO parameter layouts (inputs staged in the program's preferred form)
    from tpucenterface.detector import stage_inputs

    fn128, fmts = det._batch_fn_auto(
        dev_b, (640, 640), 640, identity=True, max_dets=100
    )
    imgs128, hws128 = stage_inputs(fmts, imgs128_np, hws128_np)
    serving_dev_ips = _fifo_ips(fn128, imgs128, hws128, dev_b, n128)

    from tpucenterface.runtime.serving import ServingEngine

    host_reqs = [
        rng.randint(0, 255, (batch, 640, 640, 3), np.uint8) for _ in range(16)
    ]
    eng = ServingEngine(det, (640, 640), device_batch=dev_b)
    list(eng.map_stream((r, None) for r in host_reqs[:4]))  # warm
    t0 = time.perf_counter()
    n_out = sum(
        len(r) for r in eng.map_stream((r, None) for r in host_reqs)
    )
    serving_wall_ips = n_out / (time.perf_counter() - t0)

    return {"metric": "images/sec/chip @640x640 bs32 fused", "value": round(ips, 1),
            "unit": "img/s", "vs_baseline": round(ips / 5000.0, 4),
            "serving_coalesced_device_img_s": round(serving_dev_ips, 1),
            "serving_coalesced_wall_img_s": round(serving_wall_ips, 1),
            "serving_device_batch": dev_b}


def config3_tta(det, wider_root=None, n_imgs=256) -> dict:
    # 256 images / 4 shapes = 64 per bucket group: the batch_size-64 chunks
    # (2B=128-image flip forwards, the occupancy knee) run FULL, as they do
    # on the real 3,226-image WIDER val; tiny n_imgs would measure padding.
    """Flip + multi-scale TTA over variable-shape images (padded buckets).

    Reports the TPU-shaped batched path (eval.batch_runner.batched_detect_tta:
    bucketed batches + device-side flip inside one jitted program) and its
    speedup over the legacy per-image detect_tta dispatch (VERDICT r1 #2:
    done = >=5x)."""
    from tpucenterface.eval.batch_runner import batched_detect_tta
    from tpucenterface.eval.tta import detect_tta

    rng = np.random.RandomState(0)
    shapes = [(480, 640), (720, 1280), (333, 500), (1024, 768)]
    imgs = [rng.randint(0, 255, s + (3,), np.uint8) for s in
            (shapes * ((n_imgs // len(shapes)) + 1))[:n_imgs]]
    scales = (0.5, 1.0)

    # batched path (compile by running the full set once — the warm pass
    # must build the same chunk-ladder executables the timed pass uses)
    batched_detect_tta(det, imgs, scales=scales, flip=True)
    plan: list = []
    t0 = time.perf_counter()
    batched_detect_tta(det, imgs, scales=scales, flip=True, launch_log=plan)
    dt_b = time.perf_counter() - t0

    # device-bound replay: run the EXACT same launch sequence on staged
    # device arrays (no per-chunk host->device upload) with one FIFO
    # barrier — separates device compute from the relay transfer wall,
    # completing the suite's tunnel/device convention for config #3
    import jax.numpy as jnp

    staged: dict = {}
    for b, shape, size, flip_ in plan:
        key = (b, shape)
        if key not in staged:
            r = np.random.RandomState(7)
            staged[key] = (
                jnp.asarray(r.randint(0, 255, (b, *shape, 3), np.uint8)),
                jnp.asarray(
                    np.tile(np.array([shape], np.int32), (b, 1))
                ),
            )
    def run_plan():
        out = None
        for b, shape, size, flip_ in plan:
            fn = (det._batch_flip_fn if flip_ else det._batch_fn)(
                b, shape, size
            )
            im, hw = staged[(b, shape)]
            out = fn(im, hw)
        _barrier(out[1])
    run_plan()  # warm any not-yet-compiled staged-shape programs
    t0 = time.perf_counter()
    run_plan()
    dt_dev = time.perf_counter() - t0

    # legacy per-image path on a subset (it is the slow one)
    n_ref = min(8, n_imgs)
    for img in imgs[: len(shapes)]:
        detect_tta(det, img, scales=scales, flip=True)
    t0 = time.perf_counter()
    for img in imgs[:n_ref]:
        detect_tta(det, img, scales=scales, flip=True)
    dt_p = time.perf_counter() - t0

    batched_ips = n_imgs / dt_b
    per_image_ips = n_ref / dt_p
    return {"metric": "TTA eval throughput (flip + 2 scales, bucketed batches)",
            "value": round(batched_ips, 2), "unit": "img/s",
            "per_image_ips": round(per_image_ips, 2),
            "speedup_vs_per_image": round(batched_ips / per_image_ips, 2),
            "device_replay_img_s": round(n_imgs / dt_dev, 2),
            "launches": len(plan)}


def config4_video(det, n_frames=60) -> dict:
    from tpucenterface.runtime.video import VideoPipeline

    rng = np.random.RandomState(0)

    def frames():
        for _ in range(n_frames):
            yield rng.randint(0, 255, (720, 1280, 3), np.uint8)

    pipe = VideoPipeline(det, size=640)
    for _ in pipe.run(frames()):
        pass
    lat = float(np.median(list(pipe.steady_latencies_ms)[5:]))

    # device-true per-frame compute (slope method): the wall fps above is
    # dominated by shipping 2.7MB/frame through the relay (VERDICT r1 #5);
    # this is the number a production host would see per frame of compute.
    import jax.numpy as jnp

    from tpucenterface.bench.timing import op_time_ms
    from tpucenterface.preprocess import pad_to_bucket

    frame = rng.randint(0, 255, (720, 1280, 3), np.uint8)
    padded = pad_to_bucket(frame)
    fn = det._single_fn(padded.shape[:2], 640)
    hw = jnp.array([720, 1280], jnp.int32)
    dev_f = jnp.asarray(np.random.RandomState(2).rand(*padded.shape) * 255,
                        jnp.float32)
    device_ms = op_time_ms(
        lambda x: fn(x.astype(jnp.uint8), hw), dev_f, k_pair=(4, 16)
    )
    # multi-stream serving variant (runtime.video.MultiStreamPipeline):
    # 8 synthetic 720p streams coalesced into one bs8 program — the per-chip
    # aggregate a multi-camera deployment sees (measured 1.10 -> 0.80
    # ms/frame device going 1 -> 8 streams)
    B = 8
    imgs8 = jnp.asarray(
        np.random.RandomState(3).randint(0, 255, (B, *padded.shape[:2], 3),
                                         np.uint8)
    )
    hws8 = jnp.asarray(np.tile(np.array([[720, 1280]], np.int32), (B, 1)))
    ms8 = 1e3 / _fifo_ips(
        det._batch_fn(B, padded.shape[:2], 640), imgs8, hws8, B, 20
    )

    return {"metric": "720p stream steady-state", "value": round(pipe.last_fps, 1),
            "unit": "fps", "p50_latency_ms": round(lat, 1),
            "tunnel_latency_ms": round(lat, 1),
            "device_ms_per_frame": round(device_ms, 3),
            "device_fps_bound": round(1000.0 / max(device_ms, 1e-6), 1),
            "multi_stream_8x_device_ms_per_frame": round(ms8, 3),
            "multi_stream_8x_aggregate_fps": round(1000.0 / max(ms8, 1e-6), 1)}


def config5_dp(det, batch=256) -> dict:
    import jax
    import jax.numpy as jnp

    from tpucenterface.runtime.sharding import data_mesh, put_sharded, shard_batch_fn

    mesh = data_mesh()
    nd = int(mesh.devices.size)
    b = batch - batch % nd
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (b, 640, 640, 3), np.uint8)
    hws = np.tile(np.array([[640, 640]], np.int32), (b, 1))
    inner = det._batch_fn(b, (640, 640), 640)
    fn = shard_batch_fn(lambda im, hw: inner(im, hw), mesh, num_batch_args=2)
    dimgs = put_sharded(jnp.asarray(imgs), mesh)
    dhws = put_sharded(jnp.asarray(hws), mesh)
    # same launch count as the int8 variant below so run-constant dispatch
    # costs amortize equally. NOTE the two variants are still DIFFERENT
    # programs by design (bf16 = the contract-literal config: letterbox
    # preprocess, eval K=200, global bs; int8 = the serving deployment:
    # identity preprocess, K=100, bs128/chip) — int8_per_chip is "what the
    # int8 serving path delivers", not an isolated quantization A/B (the
    # controlled A/B lives in bench.py's serving fields).
    n = 100
    ips = _fifo_ips(fn, dimgs, dhws, b, n)

    # int8 serving variant (opt-in W8A8). int8 wins only at PER-CHIP batch
    # >= ~128 (PERFORMANCE.md: it LOSES at per-chip bs32), so the int8 sweep
    # uses a global batch of 128 per chip rather than the config's b — the
    # DP serving deployment would coalesce to that per-chip batch anyway.
    # Guarded like bench.py: the already-measured bf16 DP number must
    # survive an int8 failure (e.g. a head_conv=0 or s2d-stem model).
    bq = 128 * nd
    ips_q = None
    try:
        imgs_q = rng.randint(0, 255, (bq, 640, 640, 3), np.uint8)
        hws_q = np.tile(np.array([[640, 640]], np.int32), (bq, 1))
        det.quantize(calib_images=imgs[:8], int8_dw=True)
        # serving-profile program, as the DP serving deployment launches it
        # (identity preprocess for pre-sized frames, serving decode K=100)
        inner_q = det._batch_fn(
            bq, (640, 640), 640, identity=True, max_dets=100
        )
        fn_q = shard_batch_fn(
            lambda im, hw: inner_q(im, hw), mesh, num_batch_args=2
        )
        dimgs_q = put_sharded(jnp.asarray(imgs_q), mesh)
        dhws_q = put_sharded(jnp.asarray(hws_q), mesh)
        ips_q = _fifo_ips(fn_q, dimgs_q, dhws_q, bq, max(100, n))
    except Exception as e:
        import sys

        print(f"# config5 int8 sweep skipped: {e}", file=sys.stderr)
    finally:
        det.dequantize()
    return {"metric": f"DP sweep bs={b} over {nd} device(s)", "value": round(ips, 1),
            "unit": "img/s", "per_chip": round(ips / nd, 1),
            "int8_img_s": round(ips_q, 1) if ips_q is not None else None,
            "int8_batch": bq,
            "int8_per_chip": round(ips_q / nd, 1) if ips_q is not None else None,
            "int8_note": "serving-profile program (identity preprocess, "
                         "K=100, bs128/chip) vs the contract-literal bf16 "
                         "config — a deployment comparison, not an isolated "
                         "quantization A/B"}


def main(argv=None):
    p = argparse.ArgumentParser(description="BASELINE 5-config bench suite")
    p.add_argument("--configs", default="1,2,3,4,5")
    p.add_argument("--weights", default=None)
    p.add_argument("--wider-root", default=None)
    args = p.parse_args(argv)

    from tpucenterface.detector import Detector

    det = (Detector.from_safetensors(args.weights) if args.weights else Detector())
    runners = {"1": config1_single_320, "2": config2_batch640, "3": config3_tta,
               "4": config4_video, "5": config5_dp}
    for c in args.configs.split(","):
        fn = runners[c.strip()]
        kw = {"wider_root": args.wider_root} if c.strip() == "3" else {}
        print(json.dumps({"config": int(c), **fn(det, **kw)}), flush=True)


if __name__ == "__main__":
    main()
