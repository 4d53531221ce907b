"""Batching inference server — the production-serving front end.

The reference repo serves nothing (its eval is `train.py -e`); a deployed
model needs a daemon.  This one is stdlib-only (ThreadingHTTPServer) around
the same engines the eval CLI uses (cli.make_engine_forward):

  * ONE fixed-shape jitted program: requests are queued and flushed as a
    padded [batch_size, H, W, 3] batch — either when full or after
    max_wait_ms — so the engine never recompiles and the MXU always sees
    the tuned batch shape (the bs128 microbatch-chain program, or any
    smaller contract).
  * the device runs asynchronously: the flusher thread dispatches a batch
    and hands the (future-like) device array to the responders, so host
    HTTP work overlaps device compute.

Endpoints:
  GET  /healthz           -> {"status": "ok", ...model info}
  GET  /stats             -> request/batch counters + padding fraction
  POST /predict           -> logits (+ optional top-k)
      body: .npy bytes (Content-Type: application/x-npy) of one [H,W,3]
      image or an [N,H,W,3] batch, float; or JSON {"instances": [...]}
      with the same shapes as nested lists.  Values are expected already
      normalized (the eval transform lives in the client / data pipeline).
      Response JSON: {"predictions": [[...num_classes logits...], ...]}
      or {"topk": [{"classes": [...], "scores": [...]}, ...]} with ?topk=K.

Usage:
    python -m mrla_tpu.serving.server -a resnet50_mrlal \
        [--torch ckpt.pth.tar | --resume runs/x] [-b 128] [--port 8000]
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class _Pending:
    """One queued image; done_event signals logits are available."""

    __slots__ = ("image", "event", "logits", "error")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.event = threading.Event()
        self.logits: Optional[np.ndarray] = None
        self.error: Optional[Exception] = None


class BatchingEngine:
    """Collects single-image requests into fixed-size padded batches.

    fwd: jitted [batch_size,H,W,3] -> [batch_size,num_classes] closure.
    Flush policy: when `batch_size` requests are waiting, immediately;
    otherwise `max_wait_ms` after the oldest request arrived.  Padding rows
    repeat row 0 (cheap, and keeps batch statistics-free engines exact —
    all shipped engines are per-sample math, so padding cannot perturb real
    rows; asserted by tests/test_server.py).
    """

    def __init__(self, fwd: Callable, batch_size: int, image_shape,
                 max_wait_ms: float = 5.0, input_dtype=np.float32):
        self.fwd = fwd
        self.batch_size = int(batch_size)
        self.image_shape = tuple(image_shape)  # (H, W, 3)
        self.max_wait_s = max_wait_ms / 1e3
        # host-side cast before the device transfer: every shipped engine
        # computes in bf16, so uploading fp32 doubles the host->device bytes
        # for rounding the device would discard anyway (ml_dtypes.bfloat16
        # is a numpy dtype; jax ships it)
        self.input_dtype = input_dtype
        self.queue: "queue.Queue[_Pending]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "padded_rows": 0}
        self._stop = threading.Event()
        # two-stage pipeline: the flusher DISPATCHES batches (jax returns a
        # device-array future immediately — async dispatch) and the
        # completer fetches results and wakes waiters, so batch N+1 runs on
        # the device while batch N's logits stream back to the host
        self._done: "queue.Queue" = queue.Queue(maxsize=2)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._completer = threading.Thread(target=self._complete_loop,
                                           daemon=True)
        self._thread.start()
        self._completer.start()

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)
        self._completer.join(timeout=5)

    def submit(self, image: np.ndarray) -> _Pending:
        if image.shape != self.image_shape:
            raise ValueError(
                f"image shape {image.shape} != server shape {self.image_shape}"
            )
        p = _Pending(np.asarray(image, np.float32))
        self.stats["requests"] += 1
        self.queue.put(p)
        return p

    def _collect(self):
        """Block for the first request, then gather until full or timeout."""
        try:
            first = self.queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.batch_size:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                batch.append(self.queue.get(timeout=left))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            n = len(batch)
            x = np.stack(
                [p.image for p in batch]
                + [batch[0].image] * (self.batch_size - n)
            ).astype(self.input_dtype)
            self.stats["batches"] += 1
            self.stats["padded_rows"] += self.batch_size - n
            try:
                out = self.fwd(x)  # async dispatch: returns immediately
            except Exception as e:  # trace/shape errors surface here
                for p in batch:
                    p.error = e
                    p.event.set()
                continue
            self._done.put((batch, out))  # bounded: backpressure at 2 deep

    def _complete_loop(self):
        while not (self._stop.is_set() and self._done.empty()):
            try:
                batch, out = self._done.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                if isinstance(out, (tuple, list)):
                    # detection export: tuple of pyramid levels, each [B,...]
                    levels = [np.asarray(o) for o in out]
                    for i, p in enumerate(batch):
                        p.logits = tuple(lv[i] for lv in levels)
                else:
                    logits = np.asarray(out)  # device fetch -> host
                    for i, p in enumerate(batch):
                        p.logits = logits[i]
            except Exception as e:  # surface device errors to the callers
                for p in batch:
                    p.error = e
            for p in batch:
                p.event.set()


def _make_handler(engine: BatchingEngine, info: dict, timeout_s: float = 120.0):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet access log
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                return self._json(200, {"status": "ok", **info})
            if self.path.startswith("/stats"):
                return self._json(200, dict(engine.stats))
            return self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if not self.path.startswith("/predict"):
                return self._json(404, {"error": f"no route {self.path}"})
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if "npy" in ctype or body[:6] == b"\x93NUMPY":
                    arr = np.load(io.BytesIO(body), allow_pickle=False)
                else:
                    arr = np.asarray(
                        json.loads(body)["instances"], np.float32
                    )
                if arr.ndim == 3:
                    arr = arr[None]
                if arr.ndim != 4:
                    raise ValueError(f"expected [N,H,W,3], got {arr.shape}")
            except Exception as e:
                return self._json(400, {"error": str(e)})

            try:
                pendings = [engine.submit(im) for im in arr]
            except ValueError as e:
                return self._json(400, {"error": str(e)})
            for p in pendings:
                if not p.event.wait(timeout=timeout_s):
                    return self._json(504, {"error": "inference timeout"})
                if p.error is not None:
                    return self._json(500, {"error": str(p.error)})

            if info.get("output") == "detections":
                # tuple per sample: (boxes [M,4], scores [M], labels [M],
                # valid [M][, masks [M,28,28]]) from the decode path ->
                # JSON, invalid rows dropped; soft masks only on ?masks=1
                want_masks = "masks=1" in self.path
                out = []
                for p_ in pendings:
                    boxes, scores, labels, valid = p_.logits[:4]
                    m = np.asarray(valid, bool)
                    det = {
                        "boxes": np.asarray(boxes)[m].astype(float).tolist(),
                        "scores": np.asarray(scores)[m].astype(float).tolist(),
                        "labels": np.asarray(labels)[m].astype(int).tolist(),
                    }
                    if want_masks and len(p_.logits) > 4:
                        det["masks"] = (
                            np.asarray(p_.logits[4])[m]
                            .astype(float).round(4).tolist()
                        )
                    out.append(det)
                return self._json(200, {"detections": out})

            if isinstance(pendings[0].logits, tuple):
                # detection export -> npz: one array per pyramid level
                n_levels = len(pendings[0].logits)
                buf = io.BytesIO()
                np.savez(
                    buf,
                    **{
                        f"level{lv}": np.stack(
                            [p.logits[lv] for p in pendings]
                        )
                        for lv in range(n_levels)
                    },
                )
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "application/x-npz")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return None

            logits = np.stack([p.logits for p in pendings])
            topk = 0
            if "topk=" in self.path:
                try:
                    topk = int(self.path.split("topk=")[1].split("&")[0])
                except ValueError:
                    pass
            if topk:
                order = np.argsort(-logits, axis=-1)[:, :topk]
                return self._json(200, {
                    "topk": [
                        {
                            "classes": order[i].tolist(),
                            "scores": logits[i, order[i]].astype(float).tolist(),
                        }
                        for i in range(len(order))
                    ]
                })
            return self._json(
                200, {"predictions": logits.astype(float).tolist()}
            )

    return Handler


def build_server(
    arch: str,
    variables,
    batch_size: int = 128,
    image_size: int = 224,
    num_classes: int = 1000,
    engine: str = "auto",
    microbatch: Optional[int] = None,
    max_wait_ms: float = 5.0,
    host: str = "127.0.0.1",
    port: int = 8000,
    timeout_s: float = 120.0,
    input_dtype=None,
    quant: str = "none",
    calib_x=None,
):
    """Returns (ThreadingHTTPServer, BatchingEngine) ready for
    serve_forever(); the first request triggers the engine jit unless you
    warm it first (main() does)."""
    from mrla_tpu.models import create_model

    model = create_model(arch, num_classes=num_classes)
    from mrla_tpu.serving.cli import make_engine_forward

    fwd = make_engine_forward(
        arch, model, variables, engine=engine, microbatch=microbatch,
        num_classes=num_classes, quant=quant, calib_x=calib_x,
    )
    if input_dtype is None:
        import ml_dtypes

        input_dtype = ml_dtypes.bfloat16
    beng = BatchingEngine(
        fwd, batch_size, (image_size, image_size, 3), max_wait_ms,
        input_dtype=input_dtype,
    )
    info = {
        "arch": arch,
        "batch_size": batch_size,
        "image_size": image_size,
        "num_classes": num_classes,
    }
    httpd = ThreadingHTTPServer(
        (host, port), _make_handler(beng, info, timeout_s=timeout_s)
    )
    return httpd, beng


def build_detect_server(
    preset: str,
    det_variables,
    batch_size: int = 8,
    image_hw=(800, 1344),
    microbatch: int = 0,
    max_wait_ms: float = 5.0,
    host: str = "127.0.0.1",
    port: int = 8000,
    timeout_s: float = 120.0,
    input_dtype=None,
):
    """Detection-export daemon: POST /predict (npy [N,H,W,3]) ->
    application/x-npz with one `level{i}` array per pyramid level.
    `preset` is a detect.configs.PRESETS key; `det_variables` the
    MRLABackboneFPN tree (convert_mmdet_state_dict / grafted)."""
    from mrla_tpu.detect.configs import PRESETS
    from mrla_tpu.serving import detect_forward, prepare_detect_params

    p = PRESETS[preset]
    layers = tuple(p.backbone_layers)
    sp = prepare_detect_params(jax.device_get(det_variables), layers=layers)

    def fwd(x):
        return detect_forward(
            sp, x, layers=layers, num_outs=p.num_outs,
            start_level=p.start_level, add_extra_convs=p.add_extra_convs,
            microbatch=microbatch,
        )

    if input_dtype is None:
        import ml_dtypes

        input_dtype = ml_dtypes.bfloat16
    h, w = image_hw
    beng = BatchingEngine(fwd, batch_size, (h, w, 3), max_wait_ms,
                          input_dtype=input_dtype)
    info = {"preset": preset, "batch_size": batch_size,
            "image_hw": [h, w], "num_outs": p.num_outs}
    httpd = ThreadingHTTPServer(
        (host, port), _make_handler(beng, info, timeout_s=timeout_s)
    )
    return httpd, beng


def build_detections_server(
    preset: str,
    det_variables,
    num_classes: int = 80,
    batch_size: int = 8,
    image_hw=(800, 1344),
    score_thr: float = 0.05,
    max_per_img: int = 100,
    max_wait_ms: float = 5.0,
    host: str = "127.0.0.1",
    port: int = 8000,
    timeout_s: float = 120.0,
    num_proposals: int = 1000,
    roi_backend: str = "auto",
    backbone_layers=None,
):
    """Full-detector daemon: POST /predict (npy [N,H,W,3]) -> JSON
    detections (boxes/scores/labels per image, mmdet test_cfg decode).

    ``roi_backend``: 'auto' (patch-DMA Pallas kernel + the presets' exact
    sampling_ratio=0 grid on the TPU backend, XLA gather + sr=2 elsewhere
    — the Pallas kernel is TPU-specific and will not compile on gpu),
    'pallas', or 'xla'.

    `det_variables`: detect.RetinaNet tree (convert_mmdet_state_dict) for
    retinanet presets, or FasterRCNN/MaskRCNN tree
    (convert_mmdet_two_stage) for the two-stage presets."""
    from mrla_tpu.detect.configs import PRESETS

    p = PRESETS[preset]
    layers = tuple(backbone_layers or p.backbone_layers)
    h, w = image_hw
    det_variables = jax.device_put(det_variables)
    if "retinanet" in preset and roi_backend == "pallas":
        # same contract as detect/train_cli: don't silently serve the
        # plain path while the operator believes the kernel is active
        raise ValueError(
            "roi_backend='pallas' applies to two-stage presets only "
            "(retinanet has no RoIAlign)"
        )
    if "retinanet" in preset:
        from mrla_tpu.detect.retinanet import RetinaNet, get_bboxes

        model = RetinaNet(
            layers=layers, num_classes=num_classes,
            dtype=jnp.bfloat16,
        )

        @jax.jit
        def fwd(x):
            outs = model.apply(det_variables, x, train=False)
            return get_bboxes(
                outs, img_shape=(h, w), score_thr=score_thr,
                max_per_img=max_per_img,
            )

    else:
        from mrla_tpu.detect.two_stage import (
            FasterRCNN, MaskRCNN, two_stage_predict,
        )

        cls = MaskRCNN if "mask" in preset else FasterRCNN
        if roi_backend == "auto":
            # patch-DMA RoIAlign: +50% e2e on TPU and the reference-exact
            # adaptive grid (sr=0) costs the same as static (ROADMAP
            # ledger); the kernel is TPU-Pallas-specific, so anything else
            # (cpu AND gpu — ADVICE r4) takes the XLA gather
            roi_backend = ("pallas" if jax.default_backend() == "tpu"
                           else "xla")
        model = cls(
            layers=layers, num_classes=num_classes,
            dtype=jnp.bfloat16, num_proposals=num_proposals,
            roi_backend=roi_backend,
            roi_sampling_ratio=(0 if roi_backend == "pallas" else 2),
        )

        @jax.jit
        def fwd(x):
            res = two_stage_predict(
                model, det_variables, x, score_thr=score_thr,
                max_per_img=max_per_img,
            )
            out = (res["det_boxes"], res["det_scores"],
                   res["det_labels"], res["det_valid"])
            if "masks" in res:  # mask preset: 28x28 soft masks per det
                out = out + (res["masks"],)
            return out

    import ml_dtypes

    beng = BatchingEngine(fwd, batch_size, (h, w, 3), max_wait_ms,
                          input_dtype=ml_dtypes.bfloat16)
    info = {"preset": preset, "batch_size": batch_size,
            "image_hw": [h, w], "num_classes": num_classes,
            "output": "detections"}
    httpd = ThreadingHTTPServer(
        (host, port), _make_handler(beng, info, timeout_s=timeout_s)
    )
    return httpd, beng


def main(argv: Optional[Sequence[str]] = None) -> None:
    p = argparse.ArgumentParser("mrla_tpu serving daemon")
    p.add_argument("-a", "--arch", default="resnet50_mrlal")
    p.add_argument("--torch", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("-b", "--batch-size", type=int, default=128)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=None,
                   help="default: 1000 (classification), 80 (COCO "
                        "detection presets)")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "mrlal", "mrlab", "precast"])
    p.add_argument("--microbatch", type=int, default=None)
    p.add_argument("--quant", default="none",
                   choices=("none", "int8", "int8-fast"),
                   help="int8 PTQ engine (mrlal only); requires "
                        "--calib-npy")
    p.add_argument("--calib-npy", default=None,
                   help="calibration batch for --quant: .npy [B,H,W,3] "
                        "float (normalized) images")
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--timeout-s", type=float, default=120.0,
                   help="per-request inference wait before 504")
    p.add_argument("--detect-preset", default=None,
                   help="serve detection feature export instead of "
                        "classification (a detect.configs.PRESETS key; "
                        "responses are npz pyramids)")
    p.add_argument("--detect-output", default="pyramid",
                   choices=["pyramid", "detections"],
                   help="'detections' runs the FULL native detector "
                        "(head + decode + NMS) and answers JSON "
                        "boxes/scores/labels")
    p.add_argument("--score-thr", type=float, default=0.05)
    p.add_argument("--image-hw", type=int, nargs=2, default=(800, 1344),
                   metavar=("H", "W"),
                   help="detection input size (COCO eval contract)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--roi-backend", default="auto",
                   choices=("auto", "xla", "pallas"),
                   help="RoIAlign path for --detect-output detections "
                        "(two-stage presets): 'auto' = patch-DMA Pallas "
                        "kernel + exact sr=0 grid on TPU, XLA gather "
                        "elsewhere")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="disable the persistent XLA compilation cache "
                        "(default: ~/.cache/mrla_tpu_jax so daemon "
                        "restarts skip the multi-minute detector compile)")
    args = p.parse_args(argv)
    if args.num_classes is None:
        # the classification default (ImageNet-1K) must not leak into the
        # detection presets (COCO: 80 classes)
        args.num_classes = 80 if args.detect_preset else 1000

    if not args.no_compile_cache:
        # the fused two-stage detector program (Pallas RoIAlign + NMS +
        # decode) compiles in ~12 min cold; persist the executable so a
        # daemon restart warms in seconds (same pattern as bench.py)
        from mrla_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()

    if args.detect_preset:
        from mrla_tpu.detect.configs import PRESETS

        preset = PRESETS[args.detect_preset]
        detections = args.detect_output == "detections"
        h, w = args.image_hw
        if args.torch:
            import torch

            sd = torch.load(args.torch, map_location="cpu")
            sd = sd.get("state_dict", sd)
            if detections and "retinanet" not in args.detect_preset:
                from mrla_tpu.ckpt.detect_convert import (
                    convert_mmdet_two_stage,
                )

                det_vars = convert_mmdet_two_stage(sd)
            else:
                from mrla_tpu.ckpt import convert_mmdet_state_dict

                det_vars = convert_mmdet_state_dict(
                    sd, num_laterals=4 - preset.start_level
                )
        else:
            print("warning: no --torch given, serving RANDOM weights",
                  flush=True)
            if detections:
                if "retinanet" in args.detect_preset:
                    from mrla_tpu.detect.retinanet import RetinaNet

                    m = RetinaNet(layers=tuple(preset.backbone_layers),
                                  num_classes=args.num_classes)
                    det_vars = jax.device_get(
                        m.init(jax.random.PRNGKey(0),
                               np.zeros((1, h, w, 3), np.float32),
                               train=False)
                    )
                else:
                    from mrla_tpu.detect.two_stage import (
                        FasterRCNN, MaskRCNN, init_detector,
                    )

                    cls = (MaskRCNN if "mask" in args.detect_preset
                           else FasterRCNN)
                    m = cls(layers=tuple(preset.backbone_layers),
                            num_classes=args.num_classes)
                    det_vars = jax.device_get(
                        init_detector(m, jax.random.PRNGKey(0),
                                      np.zeros((1, h, w, 3), np.float32))
                    )
            else:
                from mrla_tpu.detect.configs import build_backbone_fpn

                m = build_backbone_fpn(args.detect_preset)
                det_vars = jax.device_get(
                    m.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32),
                           train=False)
                )
        if detections:
            httpd, beng = build_detections_server(
                args.detect_preset, det_vars,
                num_classes=args.num_classes,
                batch_size=args.batch_size, image_hw=tuple(args.image_hw),
                score_thr=args.score_thr, max_wait_ms=args.max_wait_ms,
                host=args.host, port=args.port, timeout_s=args.timeout_s,
                roi_backend=args.roi_backend,
            )
        else:
            httpd, beng = build_detect_server(
                args.detect_preset, det_vars, batch_size=args.batch_size,
                image_hw=tuple(args.image_hw),
                microbatch=args.microbatch or 0,
                max_wait_ms=args.max_wait_ms, host=args.host,
                port=args.port, timeout_s=args.timeout_s,
            )
        warm = np.zeros((args.batch_size, h, w, 3), beng.input_dtype)
        out = beng.fwd(warm)
        jax.tree.map(np.asarray, out)
        print(f"serving {args.detect_preset} {args.detect_output} on "
              f"{args.host}:{args.port} (batch {args.batch_size}, "
              f"{h}x{w})", flush=True)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            beng.close()
            httpd.server_close()
        return

    from mrla_tpu.models import create_model
    from mrla_tpu.serving.cli import _load_variables

    model = create_model(args.arch, num_classes=args.num_classes)
    variables = _load_variables(args, model)
    calib_x = None
    if args.quant != "none":
        if not args.calib_npy:
            raise SystemExit("--quant needs --calib-npy (a [B,H,W,3] "
                             "float .npy of normalized images)")
        calib_x = np.load(args.calib_npy)
    httpd, beng = build_server(
        args.arch, variables, batch_size=args.batch_size,
        image_size=args.image_size, num_classes=args.num_classes,
        engine=args.engine, microbatch=args.microbatch,
        max_wait_ms=args.max_wait_ms, host=args.host, port=args.port,
        timeout_s=args.timeout_s, quant=args.quant, calib_x=calib_x,
    )
    # warm the jit before accepting traffic (first compile is minutes for
    # the microbatched program; .jax_cache makes repeats fast).  Same dtype
    # as the flusher's batches so the serving program is compiled exactly
    # once.
    warm = np.zeros((args.batch_size, args.image_size, args.image_size, 3),
                    beng.input_dtype)
    np.asarray(beng.fwd(warm))
    print(f"serving {args.arch} on {args.host}:{args.port} "
          f"(batch {args.batch_size}, {args.image_size}px)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        beng.close()
        httpd.server_close()


if __name__ == "__main__":
    main()
