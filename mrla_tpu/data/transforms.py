"""Image transforms: host-side geometry parameters + device-side jitted math.

Parity targets:
  * train: RandomResizedCrop(224) + HFlip + normalize
    (resnet/train.py:256-263 semantics: scale (0.08, 1.0), ratio (3/4, 4/3)).
  * eval: Resize(int(256/224·s)) + CenterCrop(s) + normalize
    (deit/datasets.py:100-105, resnet/train.py:275-280).
  * Mixup/CutMix (deit/main.py:241-247, timm defaults mixup=0.8, cutmix=1.0,
    switch 0.5) producing soft targets with label smoothing folded in.
  * Random erasing (timm 'pixel' mode, p=0.25).

TPU-first split: the host only decodes and crops bytes; resize, normalize,
flip, mixup, and erasing run jitted on device in bf16-friendly fp32.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize(x: jax.Array) -> jax.Array:
    """uint8/float [0,255] NHWC -> normalized float32."""
    x = x.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def random_resized_crop_params(
    rng: np.random.Generator,
    height: int,
    width: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop.get_params: returns (top, left, h, w)."""
    area = height * width
    log_ratio = np.log(ratio)
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = np.exp(rng.uniform(*log_ratio))
        w = int(round(np.sqrt(target_area * aspect)))
        h = int(round(np.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = int(rng.integers(0, height - h + 1))
            left = int(rng.integers(0, width - w + 1))
            return top, left, h, w
    # fallback: center crop at clamped aspect
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w, h = width, int(round(width / ratio[0]))
    elif in_ratio > ratio[1]:
        h, w = height, int(round(height * ratio[1]))
    else:
        w, h = width, height
    return (height - h) // 2, (width - w) // 2, h, w


def eval_transform_params(
    height: int, width: int, crop: int = 224, crop_pct: float = 224 / 256
) -> Tuple[int, int, int, int, int]:
    """Eval geometry: resize shorter side to crop/crop_pct, center-crop.

    Returns (resize_h, resize_w, top, left, crop)."""
    size = int(round(crop / crop_pct))
    if height <= width:
        rh, rw = size, max(1, int(round(width * size / height)))
    else:
        rh, rw = max(1, int(round(height * size / width))), size
    top = (rh - crop) // 2
    left = (rw - crop) // 2
    return rh, rw, top, left, crop


@partial(jax.jit, static_argnames=("out_size",))
def center_crop_resize(img: jax.Array, out_size: int = 224) -> jax.Array:
    """Device-side eval transform for an already-decoded [H, W, 3] image of
    STATIC shape: resize (bilinear, torch antialias=False semantics) +
    center crop + normalize."""
    h, w = img.shape[0], img.shape[1]
    rh, rw, top, left, c = eval_transform_params(h, w, out_size)
    img = jax.image.resize(img.astype(jnp.float32), (rh, rw, 3), "bilinear")
    img = jax.lax.dynamic_slice(img, (top, left, 0), (c, c, 3))
    return normalize(img)


def mixup_cutmix(
    key: jax.Array,
    images: jax.Array,
    labels: jax.Array,
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
):
    """Batch-level Mixup/CutMix with soft targets (timm semantics: one mode
    per batch, lam drawn from Beta(alpha, alpha), pair = reversed batch)."""
    b, h, w, _ = images.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    use_cutmix = jax.random.bernoulli(k1, switch_prob)

    lam_mix = jax.random.beta(k2, mixup_alpha, mixup_alpha)
    lam_cut = jax.random.beta(k3, cutmix_alpha, cutmix_alpha)
    flipped = images[::-1]

    # mixup branch
    mixed = lam_mix * images.astype(jnp.float32) + (1 - lam_mix) * flipped.astype(
        jnp.float32
    )

    # cutmix branch: one box per batch
    cut_rat = jnp.sqrt(1.0 - lam_cut)
    ch, cw = (h * cut_rat).astype(jnp.int32), (w * cut_rat).astype(jnp.int32)
    cy = jax.random.randint(k4, (), 0, h)
    cx = jax.random.randint(jax.random.fold_in(k4, 1), (), 0, w)
    y0 = jnp.clip(cy - ch // 2, 0, h)
    y1 = jnp.clip(cy + ch // 2, 0, h)
    x0 = jnp.clip(cx - cw // 2, 0, w)
    x1 = jnp.clip(cx + cw // 2, 0, w)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    box = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))[None, :, :, None]
    cut = jnp.where(box, flipped.astype(jnp.float32), images.astype(jnp.float32))
    lam_cut_eff = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)

    images_out = jnp.where(use_cutmix, cut, mixed)
    lam = jnp.where(use_cutmix, lam_cut_eff, lam_mix)

    off = label_smoothing / num_classes
    on = 1.0 - label_smoothing + off
    t1 = jax.nn.one_hot(labels, num_classes) * (on - off) + off
    t2 = jax.nn.one_hot(labels[::-1], num_classes) * (on - off) + off
    targets = lam * t1 + (1.0 - lam) * t2
    return images_out.astype(images.dtype), targets


def random_erasing(
    key: jax.Array,
    images: jax.Array,
    prob: float = 0.25,
    min_area: float = 0.02,
    max_area: float = 1 / 3,
    min_aspect: float = 0.3,
):
    """Per-sample random erasing with gaussian fill (timm 'pixel' mode)."""
    b, h, w, c = images.shape

    def erase_one(key, img):
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        do = jax.random.bernoulli(k1, prob)
        area = h * w * jax.random.uniform(k2, minval=min_area, maxval=max_area)
        log_ar = jax.random.uniform(
            k3, minval=jnp.log(min_aspect), maxval=-jnp.log(min_aspect)
        )
        ar = jnp.exp(log_ar)
        eh = jnp.clip(jnp.sqrt(area * ar).astype(jnp.int32), 1, h - 1)
        ew = jnp.clip(jnp.sqrt(area / ar).astype(jnp.int32), 1, w - 1)
        top = jax.random.randint(k4, (), 0, h - eh)
        left = jax.random.randint(k5, (), 0, w - ew)
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        box = ((yy >= top) & (yy < top + eh) & (xx >= left) & (xx < left + ew))
        noise = jax.random.normal(k6, img.shape, jnp.float32)
        return jnp.where(
            do & box[:, :, None], noise, img.astype(jnp.float32)
        ).astype(img.dtype)

    keys = jax.random.split(key, b)
    return jax.vmap(erase_one)(keys, images)
