"""Chest X-ray image preprocessing — one implementation, device or host.

The reference duplicates this pipeline three times in Python/PIL
(ReportDataset.py:277-324 + 80-106, demo.py:173-218,
findings_classifier/chexpert_dataset.py:78-125):

  1. ``remap_to_uint8``: linear min/max remap of raw pixel values to [0,255]
  2. Resize so the SHORT side equals ``resize`` (bilinear, antialiased)
  3. Center-crop to ``crop`` x ``crop`` (448 for the BLIP path, 488 for the
     findings classifier — the 488 is load-bearing, see SURVEY §7 quirk 3)
  4. Scale to [0,1] and replicate the gray channel to 3 channels

Here the resize/crop/normalize runs in JAX (jit-compiled per input shape,
runs on TPU) with a numpy fallback; JPEG decode stays on the host (PIL's C
decoder) — see radialog_tpu/data/images.py for the host loader.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def remap_to_uint8_np(array: np.ndarray) -> np.ndarray:
    """Host-side min/max remap to uint8 (matches ReportDataset.py:277-307)."""
    a = array.astype(np.float64)
    a -= a.min()
    m = a.max()
    if m > 0:
        a /= m
    a *= 255
    return a.astype(np.uint8)


def resize_short_side(h: int, w: int, target: int) -> Tuple[int, int]:
    """Output (H, W) such that the short side == target, aspect preserved
    (torchvision Resize(int) semantics)."""
    if h <= w:
        return target, max(1, round(w * target / h))
    return max(1, round(h * target / w)), target


@partial(jax.jit, static_argnames=("resize", "crop"))
def preprocess_cxr(img_u8: jax.Array, resize: int = 512, crop: int = 448) -> jax.Array:
    """(H, W) uint8 -> (crop, crop, 3) float32 in [0,1].

    jit-compiled per distinct input shape; MIMIC-CXR scans come in a handful
    of standard sizes so the compile cache stays small.
    """
    h, w = img_u8.shape
    nh, nw = resize_short_side(h, w, resize)
    x = img_u8.astype(jnp.float32)
    x = jax.image.resize(x, (nh, nw), method="linear", antialias=True)
    # torchvision CenterCrop: floor-rounded top-left corner
    top = max((nh - crop) // 2, 0)
    left = max((nw - crop) // 2, 0)
    x = jax.lax.dynamic_slice(x, (top, left), (min(crop, nh), min(crop, nw)))
    if nh < crop or nw < crop:  # pad if image smaller than crop (rare)
        x = jnp.pad(x, ((0, crop - x.shape[0]), (0, crop - x.shape[1])))
    x = jnp.clip(x / 255.0, 0.0, 1.0)
    return jnp.repeat(x[..., None], 3, axis=-1)


def preprocess_cxr_batch(imgs_u8: jax.Array, resize: int = 512, crop: int = 448) -> jax.Array:
    """(B, H, W) uint8 (equal shapes) -> (B, crop, crop, 3) float32."""
    return jax.vmap(lambda im: preprocess_cxr(im, resize=resize, crop=crop))(imgs_u8)


def expand_cxr_u8(imgs_u8: jax.Array) -> jax.Array:
    """(B, crop, crop) uint8 cropped grays -> (B, crop, crop, 3) f32 [0,1].

    The device half of the uint8 loader contract (native/loader.py
    CxrLoader(emit_u8=True)): the C++ pipeline's resize rounds back to
    uint8 exactly like PIL BILINEAR on mode-L images, so u8/255 replicated
    here is BIT-IDENTICAL to the f32 path's output while the host->device
    payload is 12x smaller — decisive under remote-device runtimes whose
    execute path marshals fresh host bytes per call (docs/PERF.md "Input
    pipeline")."""
    x = imgs_u8.astype(jnp.float32) / 255.0
    return jnp.repeat(x[..., None], 3, axis=-1)


def load_image_grayscale(path) -> np.ndarray:
    """Host JPEG/PNG decode -> remapped uint8 grayscale (H, W).

    Replaces the reference's skimage.io.imread + remap (load_image,
    ReportDataset.py:310-324) with PIL (the C decoder is the same class of
    host-side work; skimage is not in this image)."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("L") if im.mode not in ("I;16", "I") else im)
    return remap_to_uint8_np(arr)


def preprocess_cxr_np(img_u8: np.ndarray, resize: int = 512, crop: int = 448) -> np.ndarray:
    """Pure-numpy/PIL reference path (bit-compatible with the torch pipeline
    up to PIL-vs-XLA resampling differences <1 ULP-ish)."""
    from PIL import Image

    im = Image.fromarray(img_u8).convert("L")
    nh, nw = resize_short_side(im.height, im.width, resize)
    im = im.resize((nw, nh), Image.BILINEAR)
    left = max((nw - crop) // 2, 0)
    top = max((nh - crop) // 2, 0)
    im = im.crop((left, top, left + crop, top + crop))
    x = np.asarray(im, dtype=np.float32) / 255.0
    return np.repeat(x[..., None], 3, axis=-1)
