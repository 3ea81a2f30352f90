"""CLIP-style ModifiedResNet50 retrieval encoder (Flax, NHWC).

TPU-native re-design of the reference encoder (reference `models.py:191-379`,
itself from OpenAI CLIP): 3-conv stem with avgpool, anti-aliased strided
bottlenecks (stride via AvgPool after conv2; downsample = avgpool -> 1x1 conv
-> BN), and a single-query multi-head attention pool producing the
``output_dim`` (1024) embedding.

Differences from the torch original, by design:
* NHWC layout + bfloat16 compute / float32 params & BN stats — the layout
  and dtypes XLA tiles best onto the MXU (the reference casts inputs to the
  conv weight dtype, `models.py:352`; here `dtype` plays that role).
* The attention pool computes only the single query row (the mean token)
  instead of projecting all HW+1 queries and discarding all but one.
* BatchNorm statistics under data parallelism are *global* automatically:
  batch reductions inside `jit` over a sharded batch axis become
  cross-replica reductions (XLA inserts the collectives).

Parameter-for-parameter the trees line up with the reference state dict via
:mod:`art_sbir_tpu.models.torch_port`.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from art_sbir_tpu.models.layers import BN_MOMENTUM

Dtype = Any


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    """AvgPool2d(k) torch semantics: window k, stride k, no padding."""
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    """All convs stride-1; spatial reduction via AvgPool2d(stride) after
    conv2 (anti-aliasing), reference `models.py:191-236`."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inplanes = x.shape[-1]
        out_planes = self.planes * self.expansion
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )

        out = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, "conv2")(out)))
        if self.stride > 1:
            out = avg_pool(out, self.stride)
        out = bn("bn3")(conv(out_planes, 1, "conv3")(out))

        if self.stride > 1 or inplanes != out_planes:
            identity = x
            if self.stride > 1:
                identity = avg_pool(identity, self.stride)
            identity = conv(out_planes, 1, "downsample_conv")(identity)
            identity = bn("downsample_bn")(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """Single-query (mean-token) multi-head QKV pooling with a learned
    positional embedding, reference `models.py:239-272`."""

    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean_tok = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # (B, HW+1, C)

        pos = self.param(
            "positional_embedding",
            lambda key, shape: jax.random.normal(key, shape) / self.embed_dim**0.5,
            (self.spacial_dim**2 + 1, self.embed_dim),
        )
        tokens = tokens + pos[None].astype(tokens.dtype)

        dense = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
        # only the mean token is ever used as a query (reference queries x[:1])
        q = dense(self.embed_dim, "q_proj")(tokens[:, :1])
        k = dense(self.embed_dim, "k_proj")(tokens)
        v = dense(self.embed_dim, "v_proj")(tokens)

        hd = self.embed_dim // self.num_heads
        q = q.reshape(b, 1, self.num_heads, hd) * (hd**-0.5)
        k = k.reshape(b, -1, self.num_heads, hd)
        v = v.reshape(b, -1, self.num_heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        pooled = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, self.embed_dim)
        return dense(self.output_dim, "c_proj")(pooled)


class ModifiedResNet(nn.Module):
    """The CLIP RN50 visual tower, reference `models.py:275-360`."""

    layers: Sequence[int] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda f, s, name: nn.Conv(
            f, (3, 3), strides=(s, s), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        x = x.astype(self.dtype)
        x = nn.relu(bn("bn1")(conv(self.width // 2, 2, "conv1")(x)))
        x = nn.relu(bn("bn2")(conv(self.width // 2, 1, "conv2")(x)))
        x = nn.relu(bn("bn3")(conv(self.width, 1, "conv3")(x)))
        x = avg_pool(x, 2)

        widths = (self.width, self.width * 2, self.width * 4, self.width * 8)
        for stage, (planes, blocks) in enumerate(zip(widths, self.layers), start=1):
            for i in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=2 if (i == 0 and stage > 1) else 1,
                    dtype=self.dtype,
                    name=f"layer{stage}_{i}",
                )(x, train)

        embed_dim = self.width * 32
        x = AttentionPool2d(
            embed_dim=embed_dim,
            num_heads=self.heads,
            output_dim=self.output_dim,
            spacial_dim=self.input_resolution // 32,
            dtype=self.dtype,
            name="attnpool",
        )(x)
        return x.astype(jnp.float32)


class ModifiedResNetWithClassification(nn.Module):
    """Adds 1-2 linear classifier heads on the embedding (reference
    `models.py:363-379`). Returns (feature, logits[, logits2])."""

    layers: Sequence[int] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    width: int = 64
    num_classes: int = 125
    num_classes2: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, ...]:
        feature = ModifiedResNet(
            layers=self.layers,
            output_dim=self.output_dim,
            heads=self.heads,
            input_resolution=self.input_resolution,
            width=self.width,
            dtype=self.dtype,
            name="backbone",
        )(x, train)
        logits = nn.Dense(self.num_classes, name="classifier")(feature)
        if self.num_classes2 == 0:
            return feature, logits
        logits2 = nn.Dense(self.num_classes2, name="classifier2")(feature)
        return feature, logits, logits2


def create_encoder(
    with_classification: bool = False,
    num_classes: int = 125,
    num_classes2: int = 0,
    dtype: Dtype = jnp.bfloat16,
    **kw,
):
    """Factory mirroring the reference model choices (`utils.py:132-206`)."""
    if with_classification:
        return ModifiedResNetWithClassification(
            num_classes=num_classes, num_classes2=num_classes2, dtype=dtype, **kw
        )
    return ModifiedResNet(dtype=dtype, **kw)
