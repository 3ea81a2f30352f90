"""Adaptive instance normalization and CORAL color alignment.

NHWC re-design of the reference AdaIN helpers (reference
`artwork_gen_utils/function.py:4-67`). Per-channel statistics reduce over the
spatial axes; variance is the *unbiased* estimator to match
``torch.Tensor.var``'s default used by the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def calc_mean_std(feat: jax.Array, eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """Per-(batch, channel) spatial mean/std of an NHWC feature map.

    Matches reference ``calc_mean_std`` (`function.py:4-13`): unbiased
    variance + eps, then sqrt. Returns (N, 1, 1, C) tensors for broadcasting.
    """
    n, h, w, c = feat.shape
    x = feat.reshape(n, h * w, c)
    mean = jnp.mean(x, axis=1)
    var = jnp.var(x, axis=1, ddof=1) + eps
    std = jnp.sqrt(var)
    return mean[:, None, None, :], std[:, None, None, :]


def adaptive_instance_normalization(
    content_feat: jax.Array, style_feat: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """AdaIN: re-normalize content features to style feature statistics
    (reference `function.py:16-24`)."""
    style_mean, style_std = calc_mean_std(style_feat, eps)
    content_mean, content_std = calc_mean_std(content_feat, eps)
    normalized = (content_feat - content_mean) / content_std
    return normalized * style_std + style_mean


def _flatten_mean_std(feat: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(H, W, 3) image -> flattened (3, HW) + per-channel mean/std (unbiased)."""
    flat = feat.reshape(-1, 3).T  # (3, HW)
    mean = jnp.mean(flat, axis=-1, keepdims=True)
    std = jnp.std(flat, axis=-1, ddof=1, keepdims=True)
    return flat, mean, std


def _mat_sqrt(x: jax.Array) -> jax.Array:
    u, d, vt = jnp.linalg.svd(x)
    return (u * jnp.sqrt(d)[None, :]) @ vt


def coral(source: jax.Array, target: jax.Array) -> jax.Array:
    """CORAL color alignment of an (H, W, 3) source image to a target
    (reference `function.py:40-67`)."""
    src_f, src_mean, src_std = _flatten_mean_std(source)
    src_norm = (src_f - src_mean) / src_std
    src_cov = src_norm @ src_norm.T + jnp.eye(3)

    tgt_f, tgt_mean, tgt_std = _flatten_mean_std(target)
    tgt_norm = (tgt_f - tgt_mean) / tgt_std
    tgt_cov = tgt_norm @ tgt_norm.T + jnp.eye(3)

    transfer = _mat_sqrt(tgt_cov) @ (jnp.linalg.inv(_mat_sqrt(src_cov)) @ src_norm)
    out = transfer * tgt_std + tgt_mean
    return out.T.reshape(source.shape)
