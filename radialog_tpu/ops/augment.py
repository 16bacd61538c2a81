"""Training-time image augmentations — jittable, on-device.

The reference augments with torchvision
``Compose([RandomAffine(degrees=30, shear=15), ColorJitter(brightness=0.2,
contrast=0.2)])`` in both training pipelines
(findings_classifier/chexpert_dataset.py:47-52,
model/lavis/data/ReportDataset.py:242-244). Those run per-sample on the CPU
host; here the same transforms are pure ``jax.random`` functions of a PRNG
key, so they vmap over the batch and fuse into the jitted train step (the
affine gather and the jitter elementwise ops ride the same XLA program as the
forward pass — no host round-trip per image).

Semantics matched to torchvision:
  RandomAffine(degrees=30, shear=15): angle ~ U(-30, 30) deg,
    x-shear ~ U(-15, 15) deg (scalar shear is x-only), no translate/scale,
    NEAREST resampling (the torchvision default), fill=0, center = image
    center; inverse-matrix formulation of
    torchvision.transforms.functional._get_inverse_affine_matrix.
  ColorJitter(brightness=0.2, contrast=0.2): factors ~ U(0.8, 1.2);
    brightness = img*f, contrast = blend with the grayscale mean; each blend
    clamps to [0,1]; the two ops run in random order (torchvision permutes).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def affine_params(key: jax.Array, degrees: float = 30.0,
                  shear: float = 15.0) -> Tuple[jax.Array, jax.Array]:
    """Sample (angle_deg, shear_x_deg) like RandomAffine.get_params."""
    ka, ks = jax.random.split(key)
    angle = jax.random.uniform(ka, (), minval=-degrees, maxval=degrees)
    shear_x = jax.random.uniform(ks, (), minval=-shear, maxval=shear)
    return angle, shear_x


def _inverse_rss(angle_deg: jax.Array, shear_x_deg: jax.Array) -> jax.Array:
    """Inverse of the rotate+shear matrix (scale=1, shear_y=0, det=1).

    torchvision _get_inverse_affine_matrix with sy=0:
      forward RSS = [[cos r, -cos r tan sx - sin r],
                     [sin r, -sin r tan sx + cos r]]
    and the unit-determinant inverse is [[d, -b], [-c, a]].
    """
    r = jnp.deg2rad(angle_deg)
    sx = jnp.deg2rad(shear_x_deg)
    a = jnp.cos(r)
    b = -jnp.cos(r) * jnp.tan(sx) - jnp.sin(r)
    c = jnp.sin(r)
    d = -jnp.sin(r) * jnp.tan(sx) + jnp.cos(r)
    return jnp.stack([jnp.stack([d, -b]), jnp.stack([-c, a])])


def random_affine(img: jax.Array, key: jax.Array, degrees: float = 30.0,
                  shear: float = 15.0, fill: float = 0.0) -> jax.Array:
    """(H, W, C) float image -> rotated+sheared image, NEAREST, fill=0.

    Output pixel (y, x) samples input at M_inv @ ([x, y] - center) + center;
    out-of-bounds samples take ``fill``.
    """
    h, w = img.shape[0], img.shape[1]
    angle, shear_x = affine_params(key, degrees, shear)
    m = _inverse_rss(angle, shear_x)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = jnp.mgrid[0:h, 0:w]
    xin = m[0, 0] * (xs - cx) + m[0, 1] * (ys - cy) + cx
    yin = m[1, 0] * (xs - cx) + m[1, 1] * (ys - cy) + cy
    xi = jnp.round(xin).astype(jnp.int32)
    yi = jnp.round(yin).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    gathered = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    return jnp.where(valid[..., None], gathered, jnp.asarray(fill, img.dtype))


def _blend(img: jax.Array, other: jax.Array, ratio: jax.Array) -> jax.Array:
    """torchvision F._blend: ratio*img + (1-ratio)*other, clamped to [0,1]."""
    return jnp.clip(ratio * img + (1.0 - ratio) * other, 0.0, 1.0)


def color_jitter(img: jax.Array, key: jax.Array, brightness: float = 0.2,
                 contrast: float = 0.2) -> jax.Array:
    """(H, W, C) float in [0,1] -> jittered; random brightness/contrast order."""
    kb, kc, ko = jax.random.split(key, 3)
    bf = jax.random.uniform(kb, (), minval=1.0 - brightness,
                            maxval=1.0 + brightness)
    cf = jax.random.uniform(kc, (), minval=1.0 - contrast,
                            maxval=1.0 + contrast)

    def apply_brightness(x):
        return _blend(x, jnp.zeros_like(x), bf)

    def apply_contrast(x):
        if x.shape[-1] == 3:
            gray = (0.2989 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
        else:
            gray = x.mean(-1)
        return _blend(x, gray.mean(), cf)

    brightness_first = jax.random.bernoulli(ko)
    return jax.lax.cond(
        brightness_first,
        lambda x: apply_contrast(apply_brightness(x)),
        lambda x: apply_brightness(apply_contrast(x)),
        img)


def augment_cxr(img: jax.Array, key: jax.Array, degrees: float = 30.0,
                shear: float = 15.0, brightness: float = 0.2,
                contrast: float = 0.2) -> jax.Array:
    """The reference's full train-time augmentation (affine then jitter)."""
    ka, kj = jax.random.split(key)
    return color_jitter(random_affine(img, ka, degrees, shear), kj,
                        brightness, contrast)


@partial(jax.jit, static_argnames=("degrees", "shear", "brightness", "contrast"))
def augment_cxr_batch(imgs: jax.Array, key: jax.Array, degrees: float = 30.0,
                      shear: float = 15.0, brightness: float = 0.2,
                      contrast: float = 0.2) -> jax.Array:
    """(B, H, W, C) -> independently augmented batch (one subkey per image)."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(lambda im, k: augment_cxr(im, k, degrees, shear,
                                              brightness, contrast))(imgs, keys)
