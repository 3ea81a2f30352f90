"""Inception v3 multi-feature classifier (Flax, NHWC).

Counterpart of the reference's informative-drawings classifier wrapper
(reference `drawing_utils/model.py:174-279`), which wraps torchvision
inception_v3 with replaced fc/aux heads and optionally returns intermediate
features (``every_feat`` -> (logits, Mixed_6b features)). The architecture
follows the torchvision v3 graph (BasicConv2d = conv + BN(eps 1e-3) + relu;
InceptionA/B/C/D/E blocks; aux head on Mixed_6e). 299x299 inputs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from art_sbir_tpu.models.layers import BN_MOMENTUM


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ph, pw = self.padding
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=[(ph, ph), (pw, pw)], use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=BN_MOMENTUM)(x)
        return nn.relu(x)


def _pad(p):
    return [(p, p), (p, p)]


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(64, (1, 1))(x, train)
        b5 = BasicConv2d(48, (1, 1))(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2))(b5, train)
        b3 = BasicConv2d(64, (1, 1))(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1))(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1))(b3, train)
        pool = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        pool = BasicConv2d(self.pool_features, (1, 1))(pool, train)
        return jnp.concatenate([b1, b5, b3, pool], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2))(x, train)
        db = BasicConv2d(64, (1, 1))(x, train)
        db = BasicConv2d(96, (3, 3), padding=(1, 1))(db, train)
        db = BasicConv2d(96, (3, 3), strides=(2, 2))(db, train)
        pool = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, db, pool], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1))(x, train)
        b7 = BasicConv2d(c7, (1, 1))(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3))(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0))(b7, train)
        db = BasicConv2d(c7, (1, 1))(x, train)
        db = BasicConv2d(c7, (7, 1), padding=(3, 0))(db, train)
        db = BasicConv2d(c7, (1, 7), padding=(0, 3))(db, train)
        db = BasicConv2d(c7, (7, 1), padding=(3, 0))(db, train)
        db = BasicConv2d(192, (1, 7), padding=(0, 3))(db, train)
        pool = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        pool = BasicConv2d(192, (1, 1))(pool, train)
        return jnp.concatenate([b1, b7, db, pool], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(192, (1, 1))(x, train)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2))(b3, train)
        b7 = BasicConv2d(192, (1, 1))(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3))(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0))(b7, train)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2))(b7, train)
        pool = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, pool], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(320, (1, 1))(x, train)
        b3 = BasicConv2d(384, (1, 1))(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1))(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0))(b3, train)
        db = BasicConv2d(448, (1, 1))(x, train)
        db = BasicConv2d(384, (3, 3), padding=(1, 1))(db, train)
        dba = BasicConv2d(384, (1, 3), padding=(0, 1))(db, train)
        dbb = BasicConv2d(384, (3, 1), padding=(1, 0))(db, train)
        pool = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        pool = BasicConv2d(192, (1, 1))(pool, train)
        return jnp.concatenate([b1, b3a, b3b, dba, dbb, pool], axis=-1)


class InceptionAux(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.avg_pool(x, (5, 5), strides=(3, 3))
        x = BasicConv2d(128, (1, 1))(x, train)
        x = BasicConv2d(768, (5, 5))(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


class InceptionV3(nn.Module):
    """Returns (logits, aux_logits|None) or, with ``every_feat``, the
    reference's (logits, Mixed_6b features) pair (model.py:250-279)."""

    num_classes: int = 1000
    use_aux: bool = True
    every_feat: bool = False
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = BasicConv2d(32, (3, 3), strides=(2, 2))(x, train)
        x = BasicConv2d(32, (3, 3))(x, train)
        x = BasicConv2d(64, (3, 3), padding=(1, 1))(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1))(x, train)
        x = BasicConv2d(192, (3, 3))(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        x = InceptionA(32)(x, train)
        x = InceptionA(64)(x, train)
        x = InceptionA(64)(x, train)
        x = InceptionB()(x, train)
        x = InceptionC(128)(x, train)
        feat21 = InceptionC(160)(x, train)  # Mixed_6b
        x = InceptionC(160)(feat21, train)
        x = InceptionC(192)(x, train)

        aux = None
        if train and self.use_aux and not self.every_feat:
            aux = InceptionAux(self.num_classes, name="AuxLogits")(x, train)

        x = InceptionD()(x, train)
        x = InceptionE()(x, train)
        x = InceptionE()(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, name="fc")(x)

        if self.every_feat:
            return logits, feat21
        return logits, aux
