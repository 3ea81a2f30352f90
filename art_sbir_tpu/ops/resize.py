"""Bicubic resize + normalization, PIL-parity, as MXU matmuls.

The reference preprocesses every image with torchvision
``Resize(..., BICUBIC)`` on PIL images followed by CLIP normalization
(reference `models.py:289-295`, `transformations.py:9-15`). PIL's resample
is a separable convolution with Keys-cubic (a = -0.5) antialiased
coefficients. Here the per-axis coefficient matrices are precomputed on the
host (static shapes) and the resize becomes two dense matmuls —
``W_v @ img @ W_h^T`` — which XLA tiles onto the MXU and fuses with the
normalization. Parity with PIL's float path is exact; its uint8 path differs
by <= 1/255 per pass due to PIL's fixed-point quantization (see tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)  # reference models.py:294
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)  # reference utils.py:124
IMAGENET_STD = (0.229, 0.224, 0.225)


def _bicubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic kernel, PIL's `bicubic_filter`."""
    x = np.abs(x)
    return np.where(
        x < 1,
        ((a + 2) * x - (a + 3)) * x * x + 1,
        np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0),
    )


@functools.lru_cache(maxsize=64)
def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) PIL-style antialiased bicubic coefficient matrix (float64
    computation, float32 result). Mirrors PIL `precompute_coeffs`."""
    support_base = 2.0  # bicubic
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support_base * filterscale
    ss = 1.0 / filterscale
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support), 0)
        xmax = min(int(np.ceil(center + support)), in_size)
        xs = np.arange(xmin, xmax)
        k = _bicubic((xs - center + 0.5) * ss)
        w[i, xmin:xmax] = k / k.sum()
    return w.astype(np.float32)


def resize_bicubic(
    img: jax.Array, out_h: int, out_w: int, emulate_uint8: bool = False
) -> jax.Array:
    """(..., H, W, C) float -> (..., out_h, out_w, C).

    ``emulate_uint8=False``: PIL float('F')-path parity — no clamping.
    ``emulate_uint8=True``: mirrors PIL's uint8 image path, which runs the
    horizontal pass first and *rounds + clamps to [0, 255]* between and
    after passes (cubic overshoot is clipped); input must be 0..255-scaled.
    """
    h, w = img.shape[-3], img.shape[-2]
    wv = jnp.asarray(resize_matrix(h, out_h))  # (out_h, H)
    wh = jnp.asarray(resize_matrix(w, out_w))  # (out_w, W)
    hi = jnp.einsum(
        "ow,...hwc->...hoc", wh, img, precision=jax.lax.Precision.HIGHEST
    )
    if emulate_uint8:
        hi = jnp.clip(jnp.round(hi), 0.0, 255.0)
    out = jnp.einsum(
        "oh,...hwc->...owc", wv, hi, precision=jax.lax.Precision.HIGHEST
    )
    if emulate_uint8:
        out = jnp.clip(jnp.round(out), 0.0, 255.0)
    return out


def shortest_side_size(h: int, w: int, size: int) -> Tuple[int, int]:
    """torchvision Resize(int) semantics: shortest side -> size, other side
    scaled with int() truncation."""
    if h <= w:
        return size, int(size * w / h)
    return int(size * h / w), size


def center_crop_slices(h: int, w: int, crop: int) -> Tuple[int, int]:
    """torchvision CenterCrop offsets (round, matching F.center_crop)."""
    top = int(round((h - crop) / 2.0))
    left = int(round((w - crop) / 2.0))
    return top, left


def resize_center_crop(img: jax.Array, size: int, emulate_uint8: bool = False) -> jax.Array:
    """Resize(shortest=size) -> CenterCrop(size), the ModifiedResNet
    transform (reference `models.py:289-292`). Static input shape."""
    h, w = img.shape[-3], img.shape[-2]
    nh, nw = shortest_side_size(h, w, size)
    out = resize_bicubic(img, nh, nw, emulate_uint8)
    top, left = center_crop_slices(nh, nw, size)
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(out, top, top + size, axis=-3), left, left + size, axis=-2
    )


def normalize(img: jax.Array, mean=CLIP_MEAN, std=CLIP_STD) -> jax.Array:
    """(..., C) channel-last normalize; input in [0, 1]."""
    m = jnp.asarray(mean, img.dtype)
    s = jnp.asarray(std, img.dtype)
    return (img - m) / s


def clip_preprocess(
    img_uint8: jax.Array, size: int = 224, crop: bool = False
) -> jax.Array:
    """uint8 (..., H, W, 3) -> normalized float (..., size, size, 3).

    ``crop=False`` mirrors `image_transformV1` (exact (224,224) resize,
    reference transformations.py:9-15); ``crop=True`` mirrors the model's own
    transform (shortest-side + center crop, reference models.py:289-295).
    """
    x = img_uint8.astype(jnp.float32)
    if crop:
        x = resize_center_crop(x, size, emulate_uint8=True)
    else:
        x = resize_bicubic(x, size, size, emulate_uint8=True)
    return normalize(x / 255.0, CLIP_MEAN, CLIP_STD)
