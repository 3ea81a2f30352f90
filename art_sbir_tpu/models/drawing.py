"""Informative-drawings line-drawing generator (Flax, NHWC).

Architecture of the reference `DrawingGenerator`
(`drawing_utils/model.py:31-86`): reflect-pad 7x7 stem -> 2 stride-2 downs
-> n residual blocks (3 in the shipped checkpoints) -> 2 transposed-conv
ups -> reflect-pad 7x7 head -> sigmoid, 1 output channel. All norms are
InstanceNorm (no affine).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from art_sbir_tpu.models.layers import (BN_MOMENTUM, ConvTranspose,
                                         instance_norm, reflect_pad)


class _ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = reflect_pad(x, 1)
        h = nn.Conv(self.features, (3, 3), padding="VALID")(h)
        h = nn.relu(instance_norm(h))
        h = reflect_pad(h, 1)
        h = nn.Conv(self.features, (3, 3), padding="VALID")(h)
        return x + instance_norm(h)


class DrawingGenerator(nn.Module):
    output_nc: int = 1
    n_residual_blocks: int = 3
    use_sigmoid: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = reflect_pad(x, 3)
        h = nn.Conv(64, (7, 7), padding="VALID", name="stem")(h)
        h = nn.relu(instance_norm(h))

        feats = 64
        for i in range(2):
            feats *= 2
            h = nn.Conv(feats, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        name=f"down{i}")(h)
            h = nn.relu(instance_norm(h))

        for i in range(self.n_residual_blocks):
            h = _ResBlock(feats, name=f"res{i}")(h)

        for i in range(2):
            feats //= 2
            h = ConvTranspose(feats, 3, stride=2, padding=1, output_padding=1,
                              name=f"up{i}")(h)
            h = nn.relu(instance_norm(h))

        h = reflect_pad(h, 3)
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID", name="head")(h)
        return nn.sigmoid(h) if self.use_sigmoid else h


class GlobalGenerator2(nn.Module):
    """pix2pixHD-style generator from the informative-drawings utilities
    (reference `drawing_utils/model.py:130-171`; defined there but unused by
    any entry point). Faithfully mirrors its quirk of 'downsampling' with
    stride-2 transposed convs starting from ngf*8 channels."""

    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    n_upsampling: int = 0
    use_sig: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        import jax.numpy as jnp

        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                                  epsilon=1e-5)
        mult = 8
        h = reflect_pad(x, 4)
        h = nn.Conv(self.ngf * mult, (7, 7), padding="VALID")(h)
        h = nn.relu(bn()(h))
        for _ in range(self.n_downsampling):
            h = ConvTranspose(self.ngf * mult // 2, 4, stride=2, padding=1)(h)
            h = nn.relu(bn()(h))
            mult //= 2
        for _ in range(self.n_blocks):
            inner = reflect_pad(h, 1)
            inner = nn.Conv(self.ngf * mult, (3, 3), padding="VALID")(inner)
            inner = nn.relu(bn()(inner))
            inner = reflect_pad(inner, 1)
            inner = nn.Conv(self.ngf * mult, (3, 3), padding="VALID")(inner)
            h = h + bn()(inner)
        n_up = self.n_upsampling if self.n_upsampling > 0 else self.n_downsampling
        for _ in range(n_up):
            nxt = mult // 2 or 1
            h = ConvTranspose(self.ngf * nxt, 3, stride=2, padding=1,
                              output_padding=1)(h)
            h = nn.relu(bn()(h))
            mult = nxt
        h = reflect_pad(h, 3)
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID")(h)
        return nn.sigmoid(h) if self.use_sig else jnp.tanh(h)
