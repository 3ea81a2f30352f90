"""VGG16 feature extractor (Flax, NHWC) — the Photo2Sketch image encoder
backbone (reference `models.py:35-49` uses torchvision vgg16().features)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# torchvision vgg16 'D' configuration
VGG16_CFG: Sequence = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                       512, 512, 512, "M", 512, 512, 512, "M")


class VGGFeatures(nn.Module):
    """Conv features of VGG16: 3x3 convs + ReLU, 2x2 max pools.

    224 input -> (7, 7, 512); the reference feeds 256 -> (8, 8, 512) which
    the decoder's 2-D attention expects.
    """

    cfg: Sequence = VGG16_CFG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        conv_i = 0
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    v, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name=f"conv{conv_i}",
                )(x)
                x = nn.relu(x)
                conv_i += 1
        return x
