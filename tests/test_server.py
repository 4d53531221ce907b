"""Batching inference server tests (serving/server.py): queue/padding
semantics, timeout flush, error propagation, and HTTP round-trips against a
tiny real engine."""

import json
import threading
import urllib.request

import numpy as np
import jax.numpy as jnp

from mrla_tpu.serving.server import BatchingEngine, _make_handler


SHAPE = (8, 8, 3)


def _toy_fwd(x):
    """Deterministic per-image 'logits': channel means -> 3 classes."""
    return jnp.mean(jnp.asarray(x, jnp.float32), axis=(1, 2))


def _images(n, seed=0):
    return np.random.default_rng(seed).standard_normal(
        (n,) + SHAPE
    ).astype(np.float32)


def test_batching_pads_and_routes_rows():
    eng = BatchingEngine(_toy_fwd, batch_size=4, image_shape=SHAPE,
                         max_wait_ms=50.0)
    try:
        imgs = _images(5)
        pend = [eng.submit(im) for im in imgs]
        for p in pend:
            assert p.event.wait(5.0)
            assert p.error is None
        got = np.stack([p.logits for p in pend])
        want = np.asarray(_toy_fwd(imgs))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        assert eng.stats["requests"] == 5
        assert eng.stats["batches"] == 2
        # 5 rows over two 4-row batches -> 3 padded
        assert eng.stats["padded_rows"] == 3
    finally:
        eng.close()


def test_single_request_flushes_on_timeout():
    eng = BatchingEngine(_toy_fwd, batch_size=8, image_shape=SHAPE,
                         max_wait_ms=10.0)
    try:
        p = eng.submit(_images(1)[0])
        assert p.event.wait(5.0), "timeout flush never fired"
        np.testing.assert_allclose(
            p.logits, np.asarray(_toy_fwd(_images(1)))[0], rtol=1e-6
        )
    finally:
        eng.close()


def test_engine_error_propagates():
    def bad_fwd(x):
        raise RuntimeError("boom")

    eng = BatchingEngine(bad_fwd, batch_size=2, image_shape=SHAPE,
                         max_wait_ms=10.0)
    try:
        p = eng.submit(_images(1)[0])
        assert p.event.wait(5.0)
        assert p.error is not None and "boom" in str(p.error)
    finally:
        eng.close()


def test_wrong_shape_rejected():
    eng = BatchingEngine(_toy_fwd, batch_size=2, image_shape=SHAPE,
                         max_wait_ms=10.0)
    try:
        bad = np.zeros((4, 4, 3), np.float32)
        try:
            eng.submit(bad)
            assert False, "shape mismatch accepted"
        except ValueError:
            pass
    finally:
        eng.close()


def _start_http(eng, info):
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), _make_handler(eng, info)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, json.loads(r.read())


def test_http_predict_npy_json_topk_and_health():
    eng = BatchingEngine(_toy_fwd, batch_size=4, image_shape=SHAPE,
                         max_wait_ms=10.0)
    httpd, base = _start_http(eng, {"arch": "toy"})
    try:
        imgs = _images(3, seed=1)
        want = np.asarray(_toy_fwd(imgs))

        # npy batch
        import io

        buf = io.BytesIO()
        np.save(buf, imgs)
        code, out = _post(base + "/predict", buf.getvalue(),
                          "application/x-npy")
        assert code == 200
        np.testing.assert_allclose(
            np.asarray(out["predictions"]), want, rtol=1e-5
        )

        # JSON single instance (3-D -> auto-batched)
        body = json.dumps({"instances": imgs[0].tolist()}).encode()
        code, out = _post(base + "/predict", body, "application/json")
        assert code == 200
        np.testing.assert_allclose(
            np.asarray(out["predictions"])[0], want[0], rtol=1e-5
        )

        # topk
        buf = io.BytesIO()
        np.save(buf, imgs[:1])
        code, out = _post(base + "/predict?topk=2", buf.getvalue(),
                          "application/x-npy")
        assert code == 200
        order = np.argsort(-want[0])[:2]
        assert out["topk"][0]["classes"] == order.tolist()

        # bad body -> 400
        try:
            _post(base + "/predict", b"not json", "application/json")
            assert False, "bad body accepted"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # health + stats
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(base + "/stats", timeout=10) as r:
            assert json.loads(r.read())["requests"] >= 4
    finally:
        httpd.shutdown()
        httpd.server_close()
        eng.close()


def test_http_detect_export_npz():
    """Detection mode: tuple-of-pyramids results come back as npz levels
    matching the direct engine forward."""
    import io

    import jax

    from mrla_tpu.detect import MRLABackboneFPN
    from mrla_tpu.serving import detect_forward, prepare_detect_params

    layers = (1, 1, 1, 1)
    m = MRLABackboneFPN(layers=layers)
    v = jax.device_get(
        m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    )
    sp = prepare_detect_params(v, layers=layers, dtype=jnp.float32)
    fwd = lambda x: detect_forward(sp, jnp.asarray(x), layers=layers)

    eng = BatchingEngine(fwd, batch_size=2, image_shape=(64, 64, 3),
                         max_wait_ms=10.0)
    httpd, base = _start_http(eng, {"preset": "tiny"})
    try:
        imgs = np.random.default_rng(3).standard_normal(
            (2, 64, 64, 3)
        ).astype(np.float32)
        want = [np.asarray(o) for o in fwd(imgs)]

        buf = io.BytesIO()
        np.save(buf, imgs)
        req = urllib.request.Request(
            base + "/predict", data=buf.getvalue(), method="POST",
            headers={"Content-Type": "application/x-npy"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "application/x-npz"
            got = np.load(io.BytesIO(r.read()))
        assert set(got.files) == {f"level{i}" for i in range(len(want))}
        for i, w in enumerate(want):
            np.testing.assert_allclose(got[f"level{i}"], w, atol=1e-5)
    finally:
        httpd.shutdown()
        httpd.server_close()
        eng.close()


def test_http_with_real_mrlal_engine():
    """End-to-end: tiny MRLA-light resnet through make_engine_forward +
    the batching server matches the direct engine forward."""
    import jax

    from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight
    from mrla_tpu.serving.cli import make_engine_forward

    model = ResNetMRLALight(layers=[1, 1], num_classes=7)
    variables = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)
    )
    fwd = make_engine_forward(
        "resnet50_mrlal", model, variables, microbatch=0, num_classes=7
    )
    eng = BatchingEngine(fwd, batch_size=4, image_shape=(16, 16, 3),
                         max_wait_ms=10.0)
    httpd, base = _start_http(eng, {"arch": "tiny_mrlal"})
    try:
        imgs = np.random.default_rng(2).standard_normal(
            (2, 16, 16, 3)
        ).astype(np.float32)
        want = np.asarray(fwd(np.concatenate([imgs, imgs], axis=0)))[:2]

        import io

        buf = io.BytesIO()
        np.save(buf, imgs)
        code, out = _post(base + "/predict", buf.getvalue(),
                          "application/x-npy")
        assert code == 200
        got = np.asarray(out["predictions"])
        assert got.shape == (2, 7)
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        httpd.shutdown()
        httpd.server_close()
        eng.close()


def test_quant_engine_through_batching_server():
    """--quant int8 path: make_engine_forward routes to the PTQ engine and
    the batching server serves it (pads + per-row exactness preserved)."""
    import jax

    from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight
    from mrla_tpu.serving.cli import make_engine_forward

    model = ResNetMRLALight(layers=[1, 1], num_classes=7)
    variables = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)
    )
    calib = np.random.default_rng(5).standard_normal(
        (2, 16, 16, 3)
    ).astype(np.float32)
    fwd = make_engine_forward(
        "resnet50_mrlal", model, variables, microbatch=0, num_classes=7,
        quant="int8", calib_x=calib,
    )
    eng = BatchingEngine(fwd, batch_size=4, image_shape=(16, 16, 3),
                         max_wait_ms=10.0)
    try:
        imgs = _images(3, seed=6).astype(np.float32) if SHAPE == (16, 16, 3) \
            else np.random.default_rng(6).standard_normal(
                (3, 16, 16, 3)).astype(np.float32)
        pend = [eng.submit(im) for im in imgs]
        for p in pend:
            assert p.event.wait(30.0)
            assert p.error is None
        got = np.stack([p.logits for p in pend])
        want = np.asarray(fwd(np.concatenate(
            [imgs, imgs[:1]], axis=0)))[:3]
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        eng.close()


def test_http_detections_json():
    """--detect-output detections: the full native RetinaNet through the
    batching server answers JSON boxes/scores/labels with invalid rows
    dropped, matching a direct decode."""
    import io

    import jax

    from mrla_tpu.detect.retinanet import RetinaNet, get_bboxes

    model = RetinaNet(layers=(1, 1, 1, 1), num_classes=3)
    v = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)),
                   train=False)
    )

    def fwd(x):
        outs = model.apply(v, jnp.asarray(x, jnp.float32), train=False)
        return get_bboxes(outs, img_shape=(128, 128), score_thr=0.005,
                          max_per_img=5)

    eng = BatchingEngine(fwd, batch_size=2, image_shape=(128, 128, 3),
                         max_wait_ms=10.0)
    httpd, base = _start_http(eng, {"preset": "tiny",
                                    "output": "detections"})
    try:
        imgs = np.random.default_rng(4).standard_normal(
            (2, 128, 128, 3)
        ).astype(np.float32)
        wb, ws, wl, wv = [np.asarray(o) for o in fwd(imgs)]

        buf = io.BytesIO()
        np.save(buf, imgs)
        req = urllib.request.Request(
            base + "/predict", data=buf.getvalue(), method="POST",
            headers={"Content-Type": "application/x-npy"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 200
            got = json.loads(r.read())["detections"]
        assert len(got) == 2
        for i, det in enumerate(got):
            m = wv[i]
            assert len(det["boxes"]) == int(m.sum())
            np.testing.assert_allclose(
                np.asarray(det["boxes"], np.float32).reshape(-1, 4),
                wb[i][m], atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(det["scores"]), ws[i][m], atol=1e-5
            )
            assert det["labels"] == wl[i][m].tolist()
    finally:
        httpd.shutdown()
        httpd.server_close()
        eng.close()


def test_http_detections_with_masks():
    """Mask-preset detections serving: ?masks=1 returns 28x28 soft masks
    per valid detection; the plain call omits them."""
    import io

    import jax

    from mrla_tpu.detect.two_stage import (
        MaskRCNN, init_detector, two_stage_predict,
    )

    model = MaskRCNN(layers=(1, 1, 1, 1), num_classes=3, rpn_nms_pre=50,
                     num_proposals=10)
    v = jax.device_get(
        init_detector(model, jax.random.key(0),
                      jnp.zeros((1, 128, 128, 3)))
    )

    def fwd(x):
        res = two_stage_predict(model, v, jnp.asarray(x, jnp.float32),
                                score_thr=0.0, max_per_img=3)
        return (res["det_boxes"], res["det_scores"], res["det_labels"],
                res["det_valid"], res["masks"])

    eng = BatchingEngine(fwd, batch_size=1, image_shape=(128, 128, 3),
                         max_wait_ms=10.0)
    httpd, base = _start_http(eng, {"output": "detections"})
    try:
        img = np.random.default_rng(5).standard_normal(
            (1, 128, 128, 3)
        ).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, img)
        for path, want_masks in [("/predict", False),
                                 ("/predict?masks=1", True)]:
            req = urllib.request.Request(
                base + path, data=buf.getvalue(), method="POST",
                headers={"Content-Type": "application/x-npy"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                det = json.loads(r.read())["detections"][0]
            assert ("masks" in det) == want_masks
            if want_masks and det["boxes"]:
                marr = np.asarray(det["masks"])
                assert marr.shape == (len(det["boxes"]), 28, 28)
                assert ((marr >= 0) & (marr <= 1)).all()
    finally:
        httpd.shutdown()
        httpd.server_close()
        eng.close()


def test_build_detections_server_two_stage_roi_backend():
    """build_detections_server with a two-stage preset honors the round-5
    --roi-backend plumbing: 'auto' resolves to the XLA gather on CPU (the
    Pallas kernel is TPU-only) and the daemon answers detections JSON."""
    import io

    import jax

    from mrla_tpu.detect.two_stage import FasterRCNN, init_detector
    from mrla_tpu.serving.server import build_detections_server

    v = jax.device_get(
        init_detector(
            FasterRCNN(layers=(1, 1, 1, 1), num_classes=3,
                       rpn_nms_pre=32, num_proposals=8),
            jax.random.key(0), jnp.zeros((1, 128, 128, 3)),
        )
    )
    httpd, beng = build_detections_server(
        "faster_rcnn_r50mrlal_fpn_1x_coco", v, num_classes=3,
        batch_size=2, image_hw=(128, 128), max_wait_ms=10.0,
        port=0, num_proposals=8, roi_backend="auto",
        backbone_layers=(1, 1, 1, 1),
    )
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    import threading

    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        imgs = np.random.default_rng(4).standard_normal(
            (1, 128, 128, 3)
        ).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, imgs)
        req = urllib.request.Request(
            base + "/predict", data=buf.getvalue(), method="POST",
            headers={"Content-Type": "application/x-npy"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
            got = json.loads(r.read())["detections"]
        assert len(got) == 1
        assert set(got[0]) >= {"boxes", "scores", "labels"}
    finally:
        httpd.shutdown()
        httpd.server_close()
        beng.close()
