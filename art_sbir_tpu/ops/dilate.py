"""Morphological dilation as fused max-pool shifts (VPU-friendly).

Two variants the reference uses:

* scipy's ``binary_dilation`` with the default 4-connected cross structure
  inside the stroke rasterizer (reference `rasterize.py:38,147`);
* cv2's 4x4 all-ones dilation + binarize-at-250 used by the ``dilate`` CLI to
  thicken thin synthetic sketches (reference `transformations.py:68-91`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_dilate_cross(img: jax.Array) -> jax.Array:
    """scipy.ndimage.binary_dilation default-structure parity on (..., H, W)
    boolean/float canvases: out = m | up | down | left | right, zero-padded
    borders."""
    m = img.astype(jnp.bool_)
    pad = [(0, 0)] * (m.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(m, pad)
    h, w = img.shape[-2], img.shape[-1]
    c = p[..., 1 : 1 + h, 1 : 1 + w]
    up = p[..., 0:h, 1 : 1 + w]
    down = p[..., 2 : 2 + h, 1 : 1 + w]
    left = p[..., 1 : 1 + h, 0:w]
    right = p[..., 1 : 1 + h, 2 : 2 + w]
    return c | up | down | left | right


def dilate_maxpool(img: jax.Array, ksize: int = 4) -> jax.Array:
    """cv2.dilate parity with a ksize x ksize all-ones kernel on (..., H, W).

    cv2 anchors the kernel at (ksize//2, ksize//2) and reflects it about the
    anchor: output(y, x) = max over img[y - a .. y + (k-1-a)] with a = k//2
    (empirically verified against cv2.dilate). Borders replicate, matching
    cv2's default border handling for dilation.
    """
    a = ksize // 2
    lo, hi = a, ksize - 1 - a
    pad = [(0, 0)] * (img.ndim - 2) + [(lo, hi), (lo, hi)]
    p = jnp.pad(img, pad, mode="edge")
    window = jax.lax.reduce_window(
        p,
        -jnp.inf if jnp.issubdtype(img.dtype, jnp.floating) else jnp.iinfo(img.dtype).min,
        jax.lax.max,
        window_dimensions=(1,) * (img.ndim - 2) + (ksize, ksize),
        window_strides=(1,) * img.ndim,
        padding="VALID",
    )
    return window.astype(img.dtype)


def dilate_binarize(img: jax.Array, ksize: int = 4, threshold: int = 250) -> jax.Array:
    """The reference ``dilate`` CLI body (reference `transformations.py:80-91`):
    grayscale dilation then threshold at 250 -> {0, 255}."""
    d = dilate_maxpool(img.astype(jnp.float32), ksize)
    return jnp.where(d > threshold, 255.0, 0.0).astype(jnp.uint8)
