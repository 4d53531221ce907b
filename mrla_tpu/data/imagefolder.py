"""ImageFolder dataset + threaded host loader.

Directory layout contract = torchvision ImageFolder (class subdirectories,
resnet/train.py:249-263).  Host side does decode + crop to a STATIC
[size, size, 3] uint8 (PIL, or the native C++ libjpeg loader when built —
mrla_tpu/data/native); everything else (normalize, flip, mixup, erasing)
runs jitted on device via mrla_tpu.data.transforms.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _PIL_RESAMPLE(interpolation: str):
    from PIL import Image

    try:
        return {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC}[interpolation]
    except KeyError:
        raise ValueError(f"unknown interpolation {interpolation!r}") from None


class ImageFolder:
    """Scans root/class_x/*.jpg; stable class order = sorted names."""

    def __init__(self, root: str):
        self.root = root
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        if not classes:
            raise FileNotFoundError(f"no class directories under {root}")
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: list[tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append((os.path.join(cdir, fn), self.class_to_idx[c]))
        if not self.samples:
            raise FileNotFoundError(f"no images under {root}")

    def __len__(self) -> int:
        return len(self.samples)

    def load_train(
        self,
        idx: int,
        size: int,
        rng: np.random.Generator,
        interpolation: str = "bilinear",
    ) -> np.ndarray:
        """RandomResizedCrop geometry on host -> [size, size, 3] uint8.

        interpolation: 'bilinear' = the torchvision-default ResNet recipe
        (resnet/train.py:254-258); 'bicubic' = the timm create_transform
        default used by the DeiT recipe (deit/datasets.py:78-105).
        """
        from PIL import Image

        from mrla_tpu.data.transforms import random_resized_crop_params

        resample = _PIL_RESAMPLE(interpolation)
        path, _ = self.samples[idx]
        with Image.open(path) as im:
            im = im.convert("RGB")
            w, h = im.size
            top, left, ch, cw = random_resized_crop_params(rng, h, w)
            im = im.resize(
                (size, size), resample, box=(left, top, left + cw, top + ch)
            )
            return np.asarray(im, np.uint8)

    def load_eval(
        self, idx: int, size: int, interpolation: str = "bilinear"
    ) -> np.ndarray:
        """Resize-shorter-side + center crop -> [size, size, 3] uint8."""
        from PIL import Image

        from mrla_tpu.data.transforms import eval_transform_params

        resample = _PIL_RESAMPLE(interpolation)
        path, _ = self.samples[idx]
        with Image.open(path) as im:
            im = im.convert("RGB")
            w, h = im.size
            rh, rw, top, left, c = eval_transform_params(h, w, size)
            im = im.resize((rw, rh), resample)
            im = im.crop((left, top, left + c, top + c))
            return np.asarray(im, np.uint8)


def iterate_batches(
    dataset: ImageFolder,
    indices: Sequence[int],
    batch_size: int,
    size: int = 224,
    train: bool = True,
    seed: int = 0,
    num_threads: int = 8,
    drop_last: Optional[bool] = None,
    interpolation: str = "bilinear",
) -> Iterator[dict]:
    """Threaded prefetching batch iterator yielding
    {"image": uint8 [B,S,S,3], "label": int32 [B]}."""
    if drop_last is None:
        drop_last = train
    indices = np.asarray(indices)
    n_batches = len(indices) // batch_size if drop_last else -(-len(indices) // batch_size)

    # Fast path: the native C++ libjpeg loader (mrla_tpu/data/native) when
    # every file is a JPEG.  Note: its eval transform resamples the center
    # box directly (single pass) — visually equivalent to, but not
    # bit-identical with, PIL's resize-then-crop.
    use_native = False
    try:
        from mrla_tpu.data import native

        # The C++ path resamples bilinearly; keep PIL for bicubic recipes.
        use_native = (
            interpolation == "bilinear"
            and native.available()
            and all(p.lower().endswith((".jpg", ".jpeg")) for p, _ in dataset.samples)
        )
    except Exception:
        use_native = False

    def make_batch(bi: int) -> dict:
        idxs = indices[bi * batch_size : (bi + 1) * batch_size]
        labels = np.asarray([dataset.samples[i][1] for i in idxs], np.int32)
        if use_native:
            paths = [dataset.samples[i][0] for i in idxs]
            imgs = native.decode_batch(
                paths, size, train=train, seed=seed * 1_000_003 + bi, num_threads=2
            )
            return {"image": imgs, "label": labels}
        rng = np.random.default_rng((seed, bi))
        imgs = np.empty((len(idxs), size, size, 3), np.uint8)
        for j, idx in enumerate(idxs):
            imgs[j] = (
                dataset.load_train(idx, size, rng, interpolation)
                if train
                else dataset.load_eval(idx, size, interpolation)
            )
        return {"image": imgs, "label": labels}

    q: queue.Queue = queue.Queue(maxsize=num_threads * 2)
    stop = threading.Event()

    def worker(worker_id: int) -> None:
        for bi in range(worker_id, n_batches, num_threads):
            if stop.is_set():
                return
            item = (bi, make_batch(bi))
            # bounded put that re-checks stop: a consumer that abandons
            # the generator early (partial eval) sets stop in its finally,
            # but a plain q.put on the full queue would block forever,
            # stranding the thread and its decoded batch
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    break
                except queue.Full:
                    continue

    threads = [
        threading.Thread(target=worker, args=(t,), daemon=True)
        for t in range(min(num_threads, max(1, n_batches)))
    ]
    for t in threads:
        t.start()

    try:
        pending: dict[int, dict] = {}
        for want in range(n_batches):
            while want not in pending:
                bi, batch = q.get()
                pending[bi] = batch
            yield pending.pop(want)
    finally:
        stop.set()
