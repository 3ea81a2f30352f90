"""Style-transfer odds and ends kept for inventory parity with the
reference's drawing utilities: gram matrices and ImageNet batch
normalization (reference `drawing_utils/utils_pl.py:6-23`), plus the
CycleGAN-style replay buffer (reference `drawing_utils/utils.py:11-45`) —
the buffer is host-side state feeding device steps."""

from __future__ import annotations

import random
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def gram_matrix(feat: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, C, C) / (C*H*W) (reference `utils_pl.py:6-12`)."""
    b, h, w, c = feat.shape
    x = feat.reshape(b, h * w, c)
    gram = jnp.einsum("bnc,bnd->bcd", x, x)
    return gram / (c * h * w)


def normalize_batch(batch01: jax.Array) -> jax.Array:
    """ImageNet-normalize a [0, 1] NHWC batch (reference `utils_pl.py:15-23`)."""
    mean = jnp.asarray([0.485, 0.456, 0.406], batch01.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], batch01.dtype)
    return (batch01 - mean) / std


class ReplayBuffer:
    """50-image history buffer for discriminator inputs (reference
    `drawing_utils/utils.py:11-45`): each incoming image is stored while the
    buffer fills; afterwards, with p=0.5 a random stored image is returned
    (and replaced), else the incoming one."""

    def __init__(self, max_size: int = 50, seed: int = 0):
        assert max_size > 0
        self.max_size = max_size
        self.data: List[np.ndarray] = []
        self.rng = random.Random(seed)

    def push_and_pop(self, batch: jax.Array) -> jax.Array:
        out = []
        for element in np.asarray(batch):
            if len(self.data) < self.max_size:
                self.data.append(element)
                out.append(element)
            elif self.rng.uniform(0, 1) > 0.5:
                i = self.rng.randint(0, self.max_size - 1)
                out.append(self.data[i].copy())
                self.data[i] = element
            else:
                out.append(element)
        return jnp.asarray(np.stack(out))
