"""RandAugment (timm `rand-m9-mstd0.5` semantics) — device-side, jittable.

The DeiT recipe (deit/main.py:57: --aa rand-m9-mstd0.5-inc1) applies N=2
random ops per image from the standard pool, magnitude ~N(9, 0.5·?) —
timm draws magnitude per-op from N(m, mstd) clipped to [0, 10].

TPU-first: every op is expressed as a static-shape jnp transform; per-image
op selection is a lax.switch inside vmap, so one jitted call augments the
whole batch on device.  Geometric ops use fixed-size affine resampling
(bilinear gather); color ops are elementwise.  Images are float in [0, 255].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_MAX_LEVEL = 10.0


def _affine_sample(img: jax.Array, mat: jax.Array) -> jax.Array:
    """Inverse-warp img [H,W,3] by 2x3 affine matrix (output->input coords),
    bilinear, grey (128) fill outside."""
    h, w, _ = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = mat[0, 0] * xx + mat[0, 1] * yy + mat[0, 2]
    sy = mat[1, 0] * xx + mat[1, 1] * yy + mat[1, 2]

    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    wx = sx - x0; wy = sy - y0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = img[yi, xi]
        return jnp.where(valid[..., None], vals, 128.0)

    v00 = gather(y0, x0); v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0); v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _blend(a, b, factor):
    return a + (b - a) * factor


def _grayscale(img):
    g = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    return jnp.stack([g, g, g], -1)


# --- ops: (img [H,W,3] float 0..255, level float 0..10, sign ±1) -> img ---

def _identity(img, level, sign):
    return img


def _auto_contrast(img, level, sign):
    lo = img.min(axis=(0, 1), keepdims=True)
    hi = img.max(axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    return jnp.where(hi > lo, (img - lo) * scale, img)


def _equalize(img, level, sign):
    # per-channel histogram equalization, PIL ImageOps.equalize algorithm
    def eq_channel(c):
        ci = jnp.clip(c, 0, 255).astype(jnp.int32)
        hist = jnp.zeros(256, jnp.int32).at[ci.reshape(-1)].add(1)
        step = (hist.sum() - hist[255]) // 255
        cum_excl = jnp.cumsum(hist) - hist  # exclusive prefix sum
        lut = (step // 2 + cum_excl) // jnp.maximum(step, 1)
        lut = jnp.clip(lut, 0, 255).astype(jnp.float32)
        return jnp.where(step > 0, lut[ci], c)

    return jnp.stack([eq_channel(img[..., i]) for i in range(3)], -1)


def _invert(img, level, sign):
    return 255.0 - img


def _rotate(img, level, sign):
    deg = sign * level / _MAX_LEVEL * 30.0
    rad = deg * jnp.pi / 180.0
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    c, s = jnp.cos(rad), jnp.sin(rad)
    mat = jnp.array([[c, -s, cx - c * cx + s * cy],
                     [s, c, cy - s * cx - c * cy]])
    return _affine_sample(img, mat)


def _posterize(img, level, sign):
    bits = 4 - (level / _MAX_LEVEL * 4).astype(jnp.int32)
    # shift by min(8-bits, 7) then zero the bits==0 case explicitly:
    # uint8 shifts of >=8 are undefined, but PIL posterize(img, 0) is an
    # all-zero image, not top-bit-only
    shift = jnp.clip(8 - bits, 0, 7).astype(jnp.uint8)
    vals = img.astype(jnp.uint8)
    out = jnp.left_shift(jnp.right_shift(vals, shift), shift)
    out = jnp.where(bits <= 0, jnp.zeros_like(out), out)
    return out.astype(jnp.float32)


def _solarize(img, level, sign):
    thresh = 256.0 - level / _MAX_LEVEL * 256.0
    return jnp.where(img >= thresh, 255.0 - img, img)


def _solarize_add(img, level, sign):
    add = level / _MAX_LEVEL * 110.0
    return jnp.where(img < 128.0, jnp.clip(img + add, 0, 255), img)


def _color(img, level, sign):
    factor = 1.0 + sign * level / _MAX_LEVEL * 0.9
    return jnp.clip(_blend(_grayscale(img), img, factor), 0, 255)


def _contrast(img, level, sign):
    factor = 1.0 + sign * level / _MAX_LEVEL * 0.9
    mean = _grayscale(img).mean()
    return jnp.clip(_blend(jnp.full_like(img, mean), img, factor), 0, 255)


def _brightness(img, level, sign):
    factor = 1.0 + sign * level / _MAX_LEVEL * 0.9
    return jnp.clip(img * factor, 0, 255)


def _sharpness(img, level, sign):
    factor = 1.0 + sign * level / _MAX_LEVEL * 0.9
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    blurred = jax.lax.conv_general_dilated(
        img[None], kernel[:, :, None, None] * jnp.eye(3)[None, None],
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    return jnp.clip(_blend(blurred, img, factor), 0, 255)


def _shear_x(img, level, sign):
    v = sign * level / _MAX_LEVEL * 0.3
    mat = jnp.array([[1.0, v, 0.0], [0.0, 1.0, 0.0]])
    return _affine_sample(img, mat)


def _shear_y(img, level, sign):
    v = sign * level / _MAX_LEVEL * 0.3
    mat = jnp.array([[1.0, 0.0, 0.0], [v, 1.0, 0.0]])
    return _affine_sample(img, mat)


def _translate_x(img, level, sign):
    v = sign * level / _MAX_LEVEL * 0.45 * img.shape[1]
    mat = jnp.array([[1.0, 0.0, v], [0.0, 1.0, 0.0]])
    return _affine_sample(img, mat)


def _translate_y(img, level, sign):
    v = sign * level / _MAX_LEVEL * 0.45 * img.shape[0]
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, v]])
    return _affine_sample(img, mat)


OPS = [
    _identity, _auto_contrast, _equalize, _invert, _rotate, _posterize,
    _solarize, _solarize_add, _color, _contrast, _brightness, _sharpness,
    _shear_x, _shear_y, _translate_x, _translate_y,
]


@partial(jax.jit, static_argnames=("num_layers",))
def rand_augment(
    key: jax.Array,
    images: jax.Array,
    magnitude: float = 9.0,
    mag_std: float = 0.5,
    num_layers: int = 2,
) -> jax.Array:
    """Apply RandAugment to a uint8/float [B,H,W,3] batch (values 0..255)."""
    images = images.astype(jnp.float32)

    def aug_one(key, img):
        def layer(i, carry):
            img, key = carry
            key, k_op, k_mag, k_sign = jax.random.split(key, 4)
            op_idx = jax.random.randint(k_op, (), 0, len(OPS))
            level = jnp.clip(
                magnitude + mag_std * jax.random.normal(k_mag), 0, _MAX_LEVEL
            )
            sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
            img = jax.lax.switch(
                op_idx, [partial(op) for op in OPS], img, level, sign
            )
            return img, key

        img, _ = jax.lax.fori_loop(0, num_layers, layer, (img, key))
        return img

    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(aug_one)(keys, images)
