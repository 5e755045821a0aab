"""Dynamic-batching ServingEngine tests (runtime/serving.py).

CPU, small model input (64) for speed; f32 compute so the coalesced bs-16
program and the direct bs-4 program agree tightly.
"""

import numpy as np
import jax
import pytest

from tpucenterface.config import DetectorConfig, ModelConfig
from tpucenterface.detector import Detector
from tpucenterface.runtime.serving import ServingEngine

HW = (64, 64)


@pytest.fixture(scope="module")
def det():
    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"), default_size=64
    )
    return Detector(config=cfg, rng=jax.random.PRNGKey(0))


def _requests(n_req, bs, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 255, (bs, *HW, 3), np.uint8) for _ in range(n_req)]


def test_map_stream_matches_direct(det):
    reqs = _requests(6, 4)
    eng = ServingEngine(det, HW, device_batch=16, score_thresh=-1.0)
    got = list(eng.map_stream((r, None) for r in reqs))
    assert len(got) == 6
    for req_imgs, dets in zip(reqs, got):
        direct = det.detect_batch(req_imgs, score_thresh=-1.0)
        assert len(dets) == len(direct) == 4
        for a, b in zip(dets, direct):
            np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)
            np.testing.assert_allclose(a.boxes, b.boxes, atol=1e-3)


def test_map_stream_coalesces_launches(det):
    eng = ServingEngine(det, HW, device_batch=16, score_thresh=-1.0)
    launches = []
    orig = eng._fn

    def spy(batch, **kw):
        launches.append(batch)
        return orig(batch, **kw)

    eng._fn = spy
    reqs = _requests(8, 4)  # 32 images -> 2 launches of 16
    out = list(eng.map_stream((r, None) for r in reqs))
    assert len(out) == 8
    assert launches == [16, 16], launches


def test_map_stream_ragged_tail_pads_to_device_batch(det):
    eng = ServingEngine(det, HW, device_batch=16, score_thresh=-1.0)
    launches = []
    orig = eng._fn
    eng._fn = lambda b, **kw: (launches.append(b), orig(b, **kw))[1]
    reqs = _requests(3, 6)  # 18 images -> [12-image launch, 6-image launch]
    out = list(eng.map_stream((r, None) for r in reqs))
    assert len(out) == 3
    # both launches pad to the single compiled device_batch executable
    assert launches == [16, 16], launches
    # tail results are real detections, not the zero-pad dummies
    assert all(len(d.scores) > 0 for d in out[-1])


def test_submit_async_roundtrip_and_order(det):
    reqs = _requests(5, 3, seed=2)
    with ServingEngine(det, HW, device_batch=8, score_thresh=-1.0) as eng:
        futures = [eng.submit(r) for r in reqs]
        results = [f.result(timeout=120) for f in futures]
    for req_imgs, dets in zip(reqs, results):
        direct = det.detect_batch(req_imgs, score_thresh=-1.0)
        for a, b in zip(dets, direct):
            np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)
            np.testing.assert_allclose(a.boxes, b.boxes, atol=1e-3)


def test_submit_single_image_and_shape_check(det):
    with ServingEngine(det, HW, device_batch=4, score_thresh=-1.0) as eng:
        fut = eng.submit(np.zeros((*HW, 3), np.uint8))  # 3D -> 1-image request
        dets = fut.result(timeout=120)
        assert len(dets) == 1
        with pytest.raises(ValueError):
            eng.submit(np.zeros((2, 32, 32, 3), np.uint8))
    with pytest.raises(RuntimeError):
        eng.submit(np.zeros((1, *HW, 3), np.uint8))


def test_oversize_request_runs_in_one_launch(det):
    eng = ServingEngine(det, HW, device_batch=4, score_thresh=-1.0)
    launches = []
    orig = eng._fn
    eng._fn = lambda b, **kw: (launches.append(b), orig(b, **kw))[1]
    imgs = _requests(1, 6)[0]  # bigger than device_batch
    out = list(eng.map_stream([(imgs, None)]))
    assert len(out) == 1 and len(out[0]) == 6
    assert launches == [6]


def test_detector_quantize_serving_mode(det):
    """Opt-in W8A8 forward: detect still runs and tracks the float path."""
    rng = np.random.RandomState(3)
    calib = rng.randint(0, 255, (4, *HW, 3), np.uint8)
    img = rng.randint(0, 255, (*HW, 3), np.uint8)
    ref = det.detect(img, score_thresh=-1.0)
    scales = det.quantize(calib_images=calib)
    try:
        # cfg:* entries are self-description (int8_dw may be 0); every
        # actual scale must be positive
        assert scales and all(
            np.all(np.asarray(v) > 0)
            for k, v in scales.items()
            if not k.startswith("cfg:")
        )
        assert det._quant is not None
        q = det.detect(img, score_thresh=-1.0)
        assert q.boxes.shape == ref.boxes.shape
        assert np.isfinite(q.scores).all()
        # PTQ tracks the float path loosely (random weights, sigmoid scores)
        np.testing.assert_allclose(
            np.sort(q.scores), np.sort(ref.scores), atol=0.05
        )
    finally:
        det.dequantize()
    back = det.detect(img, score_thresh=-1.0)
    np.testing.assert_allclose(back.scores, ref.scores, atol=1e-6)


def test_router_mixed_sizes_match_direct(det):
    from tpucenterface.runtime.serving import ServingRouter

    rng = np.random.RandomState(11)
    sizes = [(64, 64), (40, 60), (64, 64), (100, 30), (60, 40)]
    imgs = [rng.randint(0, 255, s + (3,), np.uint8) for s in sizes]
    with ServingRouter(det, device_batch=4, score_thresh=-1.0) as router:
        futs = [router.submit(im) for im in imgs]
        got = [f.result(timeout=120) for f in futs]
        # one engine per distinct padded bucket (pad_to_bucket multiples)
        assert len(router._engines) >= 1
    for im, d in zip(imgs, got):
        ref = det.detect(im, score_thresh=-1.0)
        np.testing.assert_allclose(d.scores, ref.scores, atol=1e-5)
        np.testing.assert_allclose(d.boxes, ref.boxes, atol=1e-3)


def test_router_rejects_bad_shape(det):
    from tpucenterface.runtime.serving import ServingRouter

    with ServingRouter(det) as router:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            router.submit(np.zeros((64, 64), np.uint8))


def test_detector_quantize_int8_dw_variant(det):
    """int8_dw=True (dw convs also int8): runs, loosely tracks float."""
    rng = np.random.RandomState(4)
    calib = rng.randint(0, 255, (4, *HW, 3), np.uint8)
    img = rng.randint(0, 255, (*HW, 3), np.uint8)
    ref = det.detect(img, score_thresh=-1.0)
    det.quantize(calib_images=calib, int8_dw=True)
    try:
        assert det._quant.int8_dw
        q = det.detect(img, score_thresh=-1.0)
        assert np.isfinite(q.scores).all()
        np.testing.assert_allclose(
            np.sort(q.scores), np.sort(ref.scores), atol=0.1
        )
    finally:
        det.dequantize()


def test_async_coalesce_never_exceeds_device_batch(det):
    """Overshooting requests are carried to the NEXT group, so every launch
    reuses the single compiled device_batch executable (review finding)."""
    eng = ServingEngine(det, HW, device_batch=8, score_thresh=-1.0)
    launches = []
    orig = eng._fn

    def spy(batch, **kw):
        launches.append(batch)
        return orig(batch, **kw)

    eng._fn = spy
    with eng:
        futs = [
            eng.submit(r) for r in _requests(5, 3, seed=9)
        ]  # 15 imgs, bs3 each: 3+3 carry 3+3 carry 3
        for f in futs:
            f.result(timeout=120)
    assert set(launches) == {8}, launches


def test_submit_after_close_raises_router(det):
    from tpucenterface.runtime.serving import ServingRouter

    router = ServingRouter(det, device_batch=4, score_thresh=-1.0)
    router.close()
    with pytest.raises(RuntimeError):
        router.submit(np.zeros((*HW, 3), np.uint8))
    router.close()  # idempotent


def test_submit_rejects_non_uint8(det):
    with ServingEngine(det, HW, device_batch=4) as eng:
        with pytest.raises(ValueError):
            eng.submit(np.zeros((1, *HW, 3), np.float32))


def test_engine_stats_populated(det):
    eng = ServingEngine(det, HW, device_batch=8, score_thresh=-1.0)
    with eng:
        futs = [eng.submit(r) for r in _requests(4, 4, seed=12)]
        for f in futs:
            f.result(timeout=120)
    s = eng.stats()
    assert s["requests"] == 4 and s["images"] == 16
    assert s["launches"] >= 2  # 16 images / device_batch 8
    assert s["latency_ms_p50"] is not None and s["latency_ms_p50"] > 0
    assert s["latency_ms_max"] >= s["latency_ms_p50"]


def test_concurrent_submitters(det):
    """Multiple client threads submitting simultaneously: every future
    resolves with the right per-request result (no cross-request mixups)."""
    import threading

    payloads = {}
    results = {}
    with ServingEngine(det, HW, device_batch=8, score_thresh=-1.0) as eng:

        def client(tid):
            rng = np.random.RandomState(100 + tid)
            imgs = rng.randint(0, 255, (2, *HW, 3), np.uint8)
            payloads[tid] = imgs
            results[tid] = eng.submit(imgs).result(timeout=180)

        threads = [
            threading.Thread(target=client, args=(t,)) for t in range(6)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    for tid, dets in results.items():
        direct = det.detect_batch(payloads[tid], score_thresh=-1.0)
        for a, b in zip(dets, direct):
            np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)
            np.testing.assert_allclose(a.boxes, b.boxes, atol=1e-3)


def test_dp_serving_matches_single_device(det):
    """mesh= serving: launches run data-parallel over the 8-fake-device
    mesh; per-request results match the single-device engine."""
    from tpucenterface.runtime.sharding import data_mesh

    mesh = data_mesh()
    reqs = _requests(4, 4, seed=21)  # 16 imgs, device_batch 8 over 8 devices
    with ServingEngine(
        det, HW, device_batch=8, score_thresh=-1.0, mesh=mesh
    ) as eng:
        futs = [eng.submit(r) for r in reqs]
        dp = [f.result(timeout=180) for f in futs]
    for imgs, dets in zip(reqs, dp):
        direct = det.detect_batch(imgs, score_thresh=-1.0)
        for a, b in zip(dets, direct):
            np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)
            np.testing.assert_allclose(a.boxes, b.boxes, atol=1e-3)


def test_dp_serving_oversize_rounds_to_mesh(det):
    from tpucenterface.runtime.sharding import data_mesh

    mesh = data_mesh()
    eng = ServingEngine(det, HW, device_batch=8, score_thresh=-1.0, mesh=mesh)
    launches = []
    orig = eng._fn
    eng._fn = lambda b, **kw: (launches.append(b), orig(b, **kw))[1]
    imgs = _requests(1, 11, seed=22)[0]  # 11 > device_batch, not /8
    out = list(eng.map_stream([(imgs, None)]))
    assert len(out) == 1 and len(out[0]) == 11
    assert launches == [16], launches  # rounded up to the 8-device mesh

    with pytest.raises(ValueError):
        ServingEngine(det, HW, device_batch=12, mesh=mesh)  # 12 % 8 != 0


def test_submit_validates_in_caller_thread(det):
    """Malformed requests raise in the CALLER (a worker-thread failure would
    strand futures); review-pass-3 regression."""
    with ServingEngine(det, HW, device_batch=4) as eng:
        with pytest.raises(ValueError):  # wrong channel count
            eng.submit(np.zeros((1, *HW, 4), np.uint8))
        with pytest.raises(ValueError):  # hws row count mismatch
            eng.submit(
                np.zeros((2, *HW, 3), np.uint8),
                hws=np.zeros((3, 2), np.int32),
            )
        with pytest.raises(ValueError):  # hws wrong width
            eng.submit(
                np.zeros((1, *HW, 3), np.uint8), hws=np.zeros((1, 3))
            )


def test_reload_weights_under_serving(det):
    """Hot weight reload: subsequent launches use the new weights; results
    change, programs rebuild, and the engine keeps serving."""
    import jax

    img = np.random.RandomState(30).randint(0, 255, (1, *HW, 3), np.uint8)
    with ServingEngine(det, HW, device_batch=2, score_thresh=-1.0) as eng:
        before = eng.submit(img).result(timeout=120)[0]
        from tpucenterface.config import DetectorConfig, ModelConfig
        from tpucenterface.detector import Detector

        donor = Detector(
            config=DetectorConfig(
                model=ModelConfig(compute_dtype="float32"), default_size=64
            ),
            rng=jax.random.PRNGKey(99),
            fold_bn=False,  # raw unfolded variables exercise the fold path
        )
        # raw (unfolded) variables from a different init seed
        from tpucenterface.model.centernet import init_model

        _, raw = init_model(donor._init_config.model, rng=jax.random.PRNGKey(99))
        det.reload_weights(variables=raw)
        assert det.config.model.folded and det._quant is None
        after = eng.submit(img).result(timeout=120)[0]
    assert not np.allclose(before.scores, after.scores)
    # still a valid detection result
    assert np.isfinite(after.scores).all() and after.boxes.shape[1] == 4
    with pytest.raises(ValueError):
        det.reload_weights()


def test_serving_landmark_model():
    """ServingEngine must carry the optional landmarks through coalescing."""
    import jax

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector

    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32", with_landmarks=True),
        default_size=64,
    )
    lm_det = Detector(config=cfg, rng=jax.random.PRNGKey(3))
    rng = np.random.RandomState(31)
    imgs = rng.randint(0, 255, (3, *HW, 3), np.uint8)
    with ServingEngine(lm_det, HW, device_batch=4, score_thresh=-1.0) as eng:
        dets = eng.submit(imgs).result(timeout=120)
    direct = lm_det.detect_batch(imgs, score_thresh=-1.0)
    for a, b in zip(dets, direct):
        assert a.landmarks is not None and a.landmarks.shape[1:] == (5, 2)
        np.testing.assert_allclose(a.landmarks, b.landmarks, atol=1e-3)
        np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)


def test_router_mesh_passthrough(det):
    """ServingRouter forwards mesh= to its per-bucket engines."""
    from tpucenterface.runtime.sharding import data_mesh
    from tpucenterface.runtime.serving import ServingRouter

    mesh = data_mesh()
    with ServingRouter(
        det, device_batch=8, score_thresh=-1.0, mesh=mesh
    ) as router:
        img = np.random.RandomState(33).randint(0, 255, (*HW, 3), np.uint8)
        d = router.submit(img).result(timeout=180)
        ref = det.detect(img, score_thresh=-1.0)
        np.testing.assert_allclose(d.scores, ref.scores, atol=1e-5)
        eng = next(iter(router._engines.values()))
        assert eng.mesh is mesh


def test_dp_serving_picks_up_hot_reload(det):
    """Review-pass-4 regression: the mesh-mode DP wrapper cache must key on
    the detector's weights_version, or reloads keep serving old weights."""
    import jax

    from tpucenterface.model.centernet import init_model
    from tpucenterface.runtime.sharding import data_mesh

    mesh = data_mesh()
    img = np.random.RandomState(40).randint(0, 255, (8, *HW, 3), np.uint8)
    with ServingEngine(
        det, HW, device_batch=8, score_thresh=-1.0, mesh=mesh
    ) as eng:
        before = eng.submit(img).result(timeout=180)
        _, raw = init_model(det._init_config.model, rng=jax.random.PRNGKey(77))
        det.reload_weights(variables=raw)
        after = eng.submit(img).result(timeout=180)
    assert not np.allclose(before[0].scores, after[0].scores)


def test_batch_ladder_small_launch(det):
    """A lone small request on an idle engine rides the small ladder rung,
    not the full device_batch program (VERDICT r2 #3 low-load latency)."""
    eng = ServingEngine(det, HW, device_batch=16, score_thresh=-1.0)
    assert eng.batch_ladder == (4, 16)
    launches = []
    orig = eng._fn
    eng._fn = lambda b, **kw: (launches.append(b), orig(b, **kw))[1]
    with eng:
        dets = eng.submit(np.zeros((*HW, 3), np.uint8)).result(timeout=120)
    assert len(dets) == 1
    assert launches == [4], launches  # smallest rung >= 1


def test_batch_ladder_explicit_and_validation(det):
    eng = ServingEngine(
        det, HW, device_batch=16, batch_ladder=(16,), score_thresh=-1.0
    )
    launches = []
    orig = eng._fn
    eng._fn = lambda b, **kw: (launches.append(b), orig(b, **kw))[1]
    with eng:
        eng.submit(np.zeros((*HW, 3), np.uint8)).result(timeout=120)
    assert launches == [16]  # single-rung ladder = round-2 behavior
    with pytest.raises(ValueError):
        ServingEngine(det, HW, device_batch=16, batch_ladder=(4, 8))
    with pytest.raises(ValueError):
        ServingEngine(det, HW, device_batch=16, batch_ladder=(0, 16))


def test_stats_concurrent_hammering(det):
    """stats() polled from a monitoring thread while requests complete must
    never raise (VERDICT r2: 'deque mutated during iteration')."""
    import threading

    stop = threading.Event()
    errors = []

    def monitor(eng):
        while not stop.is_set():
            try:
                eng.stats()
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    with ServingEngine(det, HW, device_batch=4, score_thresh=-1.0) as eng:
        mon = threading.Thread(target=monitor, args=(eng,))
        mon.start()
        try:
            futs = [
                eng.submit(np.zeros((1, *HW, 3), np.uint8)) for _ in range(64)
            ]
            for f in futs:
                f.result(timeout=180)
        finally:
            stop.set()
            mon.join()
    assert not errors
    s = eng.stats()
    assert s["requests"] == 64
    assert s["pad_images"] >= 0 and s["mean_fill"] is not None


def test_map_stream_exclusive_with_submit(det):
    with ServingEngine(det, HW, device_batch=4, score_thresh=-1.0) as eng:
        eng.submit(np.zeros((1, *HW, 3), np.uint8)).result(timeout=120)
        with pytest.raises(RuntimeError):
            list(eng.map_stream([(np.zeros((1, *HW, 3), np.uint8), None)]))


def test_dp_cache_evicts_stale_versions(det):
    """Rolling reload cycles must not grow the DP wrapper cache without
    bound (ADVICE r2): stale weights_version entries drop on miss."""
    import jax

    from tpucenterface.model.centernet import init_model
    from tpucenterface.runtime.sharding import data_mesh

    mesh = data_mesh()
    img = np.zeros((8, *HW, 3), np.uint8)
    with ServingEngine(
        det, HW, device_batch=8, score_thresh=-1.0, mesh=mesh
    ) as eng:
        for seed in (50, 51):
            _, raw = init_model(
                det._init_config.model, rng=jax.random.PRNGKey(seed)
            )
            det.reload_weights(variables=raw)
            eng.submit(img).result(timeout=180)
        versions = {k[-1] for k in eng._dp_cache}  # (b, id, int8_in, ver)
    assert versions == {det.weights_version}, versions


def test_router_stats_aggregation(det):
    from tpucenterface.runtime.serving import ServingRouter

    rng = np.random.RandomState(60)
    with ServingRouter(det, device_batch=4, score_thresh=-1.0) as router:
        futs = [
            router.submit(rng.randint(0, 255, (64, 64, 3), np.uint8))
            for _ in range(5)
        ]
        for f in futs:
            f.result(timeout=120)
        s = router.stats()
    assert s["requests"] == 5 and s["images"] == 5
    assert s["launches"] >= 1 and "buckets" in s
    for bs in s["buckets"].values():
        assert bs["latency_ms_p50"] is not None


def test_serving_soak_reload_quantize_stats():
    """Production soak: concurrent submitters while weights hot-reload,
    int8 flips on/off, and a monitor hammers stats()/router engines. Every
    future must resolve with structurally valid results (values may span
    the reload/quantize transitions — documented semantics); no deadlocks,
    no stranded futures, no exceptions."""
    import threading

    import jax

    from tpucenterface.model.centernet import init_model

    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"), default_size=64
    )
    sdet = Detector(config=cfg, rng=jax.random.PRNGKey(1))
    calib = np.random.RandomState(70).randint(0, 255, (2, *HW, 3), np.uint8)
    stop = threading.Event()
    errors: list = []

    with ServingEngine(sdet, HW, device_batch=8, score_thresh=-1.0) as eng:

        def monitor():
            while not stop.is_set():
                try:
                    s = eng.stats()
                    assert s["requests"] >= 0
                except Exception as e:  # pragma: no cover
                    errors.append(("monitor", e))
                    return

        def churn():
            try:
                for i in range(3):
                    _, raw = init_model(
                        sdet._init_config.model, rng=jax.random.PRNGKey(80 + i)
                    )
                    sdet.reload_weights(variables=raw)
                    sdet.quantize(calib_images=calib)
                    sdet.dequantize()
            except Exception as e:  # pragma: no cover
                errors.append(("churn", e))

        def client(tid):
            rng = np.random.RandomState(90 + tid)
            try:
                for _ in range(6):
                    imgs = rng.randint(0, 255, (2, *HW, 3), np.uint8)
                    dets = eng.submit(imgs).result(timeout=300)
                    assert len(dets) == 2
                    for d in dets:
                        assert d.boxes.shape[1] == 4
                        assert np.isfinite(d.scores).all()
            except Exception as e:  # pragma: no cover
                errors.append((f"client{tid}", e))

        threads = (
            [threading.Thread(target=monitor)]
            + [threading.Thread(target=churn)]
            + [threading.Thread(target=client, args=(t,)) for t in range(3)]
        )
        for t in threads[1:]:
            t.start()
        threads[0].start()
        for t in threads[1:]:
            t.join(timeout=600)
        stop.set()
        threads[0].join(timeout=30)
    assert not errors, errors
    s = eng.stats()
    assert s["requests"] == 18  # 3 clients x 6 requests


def test_int8_input_engine_matches_uint8(det):
    """int8_input mode (host LUT staging + int8-in program) returns
    BIT-identical detections to the plain uint8 engine on the identity
    path, including ragged-tail pad rows (LUT(0) == the uint8 zero fill)."""
    rng = np.random.RandomState(41)
    det.quantize(
        calib_images=rng.randint(0, 255, (4, *HW, 3), np.uint8), int8_dw=True
    )
    try:
        reqs = _requests(5, 3, seed=42)  # 15 imgs -> ragged vs 16-batch
        ref = list(
            ServingEngine(det, HW, device_batch=16, score_thresh=-1.0)
            .map_stream((r, None) for r in reqs)
        )
        got = list(
            ServingEngine(
                det, HW, device_batch=16, score_thresh=-1.0, int8_input=True
            ).map_stream((r, None) for r in reqs)
        )
        assert len(got) == len(ref)
        for rs, gs in zip(ref, got):
            for rd, gd in zip(rs, gs):
                np.testing.assert_array_equal(rd.boxes, gd.boxes)
                np.testing.assert_array_equal(rd.scores, gd.scores)
    finally:
        det.dequantize()


def test_int8_input_letterbox_falls_back_to_uint8(det):
    """Non-identity launches (real letterbox resizes — float ops that can't
    consume quantized pixels) fall back to the uint8 program and still
    match the plain engine."""
    rng = np.random.RandomState(43)
    det.quantize(calib_images=rng.randint(0, 255, (4, *HW, 3), np.uint8))
    try:
        imgs = np.zeros((2, *HW, 3), np.uint8)
        imgs[:, :48, :40] = rng.randint(0, 255, (2, 48, 40, 3), np.uint8)
        hws = np.array([[48, 40], [48, 40]], np.int32)
        ref = list(
            ServingEngine(det, HW, device_batch=4, score_thresh=-1.0)
            .map_stream([(imgs, hws)])
        )
        got = list(
            ServingEngine(
                det, HW, device_batch=4, score_thresh=-1.0, int8_input=True
            ).map_stream([(imgs, hws)])
        )
        for rd, gd in zip(ref[0], got[0]):
            np.testing.assert_array_equal(rd.boxes, gd.boxes)
            np.testing.assert_array_equal(rd.scores, gd.scores)
    finally:
        det.dequantize()


def test_int8_input_requires_quantized_detector(det):
    """An int8_input engine on an unquantized detector fails the launch
    loudly (the future carries the ValueError) instead of hanging."""
    eng = ServingEngine(det, HW, device_batch=4, int8_input=True)
    rng = np.random.RandomState(44)
    fut = eng.submit(rng.randint(0, 255, (1, *HW, 3), np.uint8))
    with pytest.raises(ValueError, match="quantize"):
        fut.result(timeout=120)
    eng.close()


def test_dp_int8_input_serving_matches_single_device(det):
    """int8_input staging composes with mesh= DP serving: the LUT-staged
    int8 launch shards over the 8-fake-device mesh and matches the
    single-device int8_input engine bit-for-bit."""
    from tpucenterface.runtime.sharding import data_mesh

    rng = np.random.RandomState(45)
    det.quantize(
        calib_images=rng.randint(0, 255, (4, *HW, 3), np.uint8), int8_dw=True
    )
    try:
        reqs = _requests(3, 4, seed=46)  # 12 imgs over device_batch 8
        ref = list(
            ServingEngine(
                det, HW, device_batch=8, score_thresh=-1.0, int8_input=True
            ).map_stream((r, None) for r in reqs)
        )
        with ServingEngine(
            det, HW, device_batch=8, score_thresh=-1.0,
            mesh=data_mesh(), int8_input=True,
        ) as eng:
            futs = [eng.submit(r) for r in reqs]
            dp = [f.result(timeout=300) for f in futs]
        for rs, gs in zip(ref, dp):
            for rd, gd in zip(rs, gs):
                np.testing.assert_array_equal(rd.boxes, gd.boxes)
                np.testing.assert_array_equal(rd.scores, gd.scores)
    finally:
        det.dequantize()


def test_dp_cache_keeps_current_version_rungs(det):
    """Eviction must key on the VERSION component of the cache key, not
    int8_in (regression: k[2] vs k[3]): warming a second ladder rung at the
    same weights_version must not evict the first rung's wrapper."""
    import jax

    from tpucenterface.model.centernet import init_model
    from tpucenterface.runtime.sharding import data_mesh

    mesh = data_mesh()
    _, raw = init_model(det._init_config.model, rng=jax.random.PRNGKey(52))
    det.reload_weights(variables=raw)  # ver >= 1 so ver != int8_in's 0/1
    # device_batch=16 over 8 fake devices -> ladder (8, 16)
    with ServingEngine(
        det, HW, device_batch=16, score_thresh=-1.0, mesh=mesh
    ) as eng:
        assert eng.batch_ladder == (8, 16)
        eng.submit(np.zeros((16, *HW, 3), np.uint8)).result(timeout=180)
        eng.submit(np.zeros((1, *HW, 3), np.uint8)).result(timeout=180)
        rungs = {k[0] for k in eng._dp_cache}
        versions = {k[3] for k in eng._dp_cache}
    assert rungs == {8, 16}, rungs
    assert versions == {det.weights_version}, versions


def test_int8_input_requires_stem_bake_at_construction():
    """A model without the stem-baked preprocess can never produce the
    int8-input LUT — the engine must refuse at construction, not per
    request inside the worker."""
    from tpucenterface.config import PreprocessConfig

    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"),
        preprocess=PreprocessConfig(stem_bake=False),
        default_size=64,
    )
    d = Detector(config=cfg, rng=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="stem"):
        ServingEngine(d, HW, device_batch=8, int8_input=True)


def test_cancelled_future_does_not_block_group(det):
    """A client cancel() racing the worker's set_result must not abort
    resolving the REST of the coalesced group (the InvalidStateError is
    swallowed per-future, not thrown mid-loop)."""
    with ServingEngine(det, HW, device_batch=8, score_thresh=-1.0) as eng:
        f1 = eng.submit(np.zeros((4, *HW, 3), np.uint8))
        f2 = eng.submit(np.zeros((4, *HW, 3), np.uint8))
        f1.cancel()  # may or may not win the race — both must be harmless
        r2 = f2.result(timeout=120)
        assert len(r2) == 4
        # worker survived: the engine still serves
        assert len(eng.submit(
            np.zeros((1, *HW, 3), np.uint8)
        ).result(timeout=120)) == 1


def test_submit_rejected_during_map_stream(det):
    """Exclusivity is bidirectional: submit() while a map_stream sweep is
    mid-flight must raise (it would start a worker interleaving with the
    caller-thread pipeline)."""
    eng = ServingEngine(det, HW, device_batch=8, score_thresh=-1.0)

    def gen():
        yield (np.zeros((4, *HW, 3), np.uint8), None)
        with pytest.raises(RuntimeError, match="map_stream"):
            eng.submit(np.zeros((1, *HW, 3), np.uint8))
        yield (np.zeros((4, *HW, 3), np.uint8), None)

    out = list(eng.map_stream(gen()))
    assert len(out) == 2
    # the sweep released the engine: submit works again
    assert len(eng.submit(
        np.zeros((1, *HW, 3), np.uint8)
    ).result(timeout=120)) == 1
    eng.close()


def test_int8_input_requires_identity_fast_path():
    """int8_input with identity_fast_path=False could never take the int8
    staging branch — construction must refuse (review finding: it silently
    served the uint8 program forever)."""
    from tpucenterface.config import PreprocessConfig

    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"),
        preprocess=PreprocessConfig(identity_fast_path=False),
        default_size=64,
    )
    d = Detector(config=cfg, rng=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="identity_fast_path"):
        ServingEngine(d, HW, device_batch=8, int8_input=True)


def test_launch_fault_isolates_group_and_worker_survives(det):
    """Fault injection (VERDICT r3 #7): a device/transfer error raised by
    the jitted call mid-flight must fail ONLY that coalesced group's
    futures; the worker survives, later submits serve normally, and the
    launch counters reflect only what actually ran on device."""
    with ServingEngine(det, HW, device_batch=8, score_thresh=-1.0) as eng:
        orig = eng._fn
        boom = RuntimeError("injected device failure")

        def faulty_fn(batch, **kw):
            fn, fmts = orig(batch, **kw)

            def exploding(*a, **k):
                raise boom

            return exploding, fmts

        eng._fn = faulty_fn
        # two requests that coalesce into ONE failing launch
        bad = [eng.submit(np.zeros((4, *HW, 3), np.uint8)) for _ in range(2)]
        for f in bad:
            with pytest.raises(RuntimeError, match="injected device failure"):
                f.result(timeout=180)
        # heal the engine: subsequent groups must serve
        eng._fn = orig
        good = eng.submit(np.zeros((4, *HW, 3), np.uint8))
        dets = good.result(timeout=180)
        assert len(dets) == 4 and all(d.boxes.shape[1] == 4 for d in dets)
        s = eng.stats()
        # only the successful launch/request is counted (stats must not
        # drift from what ran on device)
        assert s["launches"] == 1
        assert s["requests"] == 1 and s["images"] == 4


def test_fetch_fault_isolates_group_and_worker_survives(det, monkeypatch):
    """Same contract for a failure on the RESULT side (device->host fetch /
    detection splitting): the group gets the exception, the worker lives."""
    with ServingEngine(det, HW, device_batch=8, score_thresh=-1.0) as eng:
        orig = det.results_to_detections
        calls = {"n": 0}

        def flaky(res, thresh, lo=0, hi=None):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected fetch failure")
            return orig(res, thresh, lo=lo, hi=hi)

        # instance-level patch (reverted by monkeypatch; det is shared
        # module-scoped)
        monkeypatch.setattr(det, "results_to_detections", flaky)
        bad = eng.submit(np.zeros((2, *HW, 3), np.uint8))
        with pytest.raises(RuntimeError, match="injected fetch failure"):
            bad.result(timeout=180)
        good = eng.submit(np.zeros((2, *HW, 3), np.uint8))
        dets = good.result(timeout=180)
        assert len(dets) == 2
        s = eng.stats()
        # the failed group's launch DID run on device (launch succeeded,
        # fetch failed) so launches==2, but its requests never completed
        assert s["launches"] == 2
        assert s["requests"] == 1 and s["images"] == 2


def test_stats_p99_field(det):
    """Latency SLO surface (VERDICT r3 #8): stats() publishes p50/p95/p99
    percentiles once requests completed."""
    with ServingEngine(det, HW, device_batch=4, score_thresh=-1.0) as eng:
        futs = [eng.submit(np.zeros((1, *HW, 3), np.uint8)) for _ in range(8)]
        for f in futs:
            f.result(timeout=180)
        s = eng.stats()
    for k in ("latency_ms_p50", "latency_ms_p95", "latency_ms_p99"):
        assert s[k] is not None and s[k] > 0
    assert s["latency_ms_p50"] <= s["latency_ms_p95"] <= s["latency_ms_p99"]


def test_slo_sweep_harness(det):
    """bench/slo_sweep.py end-to-end at toy scale: the table carries
    saturation, a lone-request floor, and per-load percentiles."""
    from tpucenterface.bench.slo_sweep import slo_sweep

    out = slo_sweep(
        det, HW, request_bs=4, device_batch=8,
        fractions=(0.5,), seconds=1.5, max_dets=None,
    )
    assert out["saturation_img_s"] > 0
    lone = out["lone_request"]
    assert lone["p50_ms"] <= lone["p95_ms"] <= lone["p99_ms"]
    (pt,) = out["loaded"]
    assert pt["load_frac"] == 0.5 and pt["achieved_requests"] >= 1
    for k in ("p50_ms", "p95_ms", "p99_ms"):
        assert pt[k] is not None and pt[k] > 0


def test_staging_plain_matches_formatted(det):
    """staging="plain" (r5: default-layout device_put + in-program relayout,
    the live-serving path on hosts where the formatted host-side pack is the
    bottleneck) must produce identical detections to the default formatted
    staging, and reject unknown modes."""
    reqs = _requests(3, 4, seed=7)
    with ServingEngine(
        det, HW, device_batch=8, score_thresh=-1.0, staging="plain"
    ) as eng:
        plain = [f.result(timeout=180) for f in [eng.submit(r) for r in reqs]]
    with ServingEngine(
        det, HW, device_batch=8, score_thresh=-1.0, staging="formatted"
    ) as eng:
        fmt = [f.result(timeout=180) for f in [eng.submit(r) for r in reqs]]
    for a_req, b_req in zip(plain, fmt):
        for a, b in zip(a_req, b_req):
            np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)
            np.testing.assert_allclose(a.boxes, b.boxes, atol=1e-3)
    with pytest.raises(ValueError, match="staging"):
        ServingEngine(det, HW, staging="warp")
