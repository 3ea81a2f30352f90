"""pix2pix generators / discriminators / GAN objectives (Flax, NHWC).

Architectures match the reference network factory (reference
`pix2pix_model.py:388-880`): ResnetGenerator (reflect-pad 7x7 stem, two
stride-2 downs, n residual blocks, two transposed-conv ups, tanh),
UnetGenerator (recursive 4x4 stride-2 skip blocks), 70x70 PatchGAN
(`NLayerDiscriminator`) and 1x1 PixelGAN. Weight init = normal(0.02)
('normal' mode of `init_weights`, `pix2pix_model.py:388-420`); norm layer
batch | instance | none with torch semantics (instance: no affine, no
running stats — use_bias follows the reference's InstanceNorm rule).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from art_sbir_tpu.models.layers import (BN_MOMENTUM, ConvTranspose,
                                         instance_norm, reflect_pad)

INIT = nn.initializers.normal(0.02)


class Norm(nn.Module):
    """batch | instance | none. ``dtype`` is the compute dtype (params and
    running stats stay f32 — flax param_dtype default)."""

    kind: str = "batch"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.kind == "batch":
            # BN scale ~ N(1.0, 0.02): the reference init_weights BN rule
            # (pix2pix_model.py:415-417)
            scale_init = lambda key, shape, dtype=jnp.float32: (
                1.0 + 0.02 * jax.random.normal(key, shape, dtype)
            )
            return nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=1e-5,
                scale_init=scale_init, dtype=self.dtype,
            )(x)
        if self.kind == "instance":
            return instance_norm(x)
        if self.kind == "none":
            return x
        raise ValueError(f"unknown norm {self.kind}")


def _use_bias(norm: str) -> bool:
    # BatchNorm has affine params -> no conv bias (reference
    # pix2pix_model.py:612-616)
    return norm == "instance" or norm == "none"


class ResnetBlock(nn.Module):
    dim: int
    norm: str = "batch"
    use_dropout: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = reflect_pad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=_use_bias(self.norm),
                    kernel_init=INIT, dtype=self.dtype)(h)
        h = nn.relu(Norm(self.norm, self.dtype)(h, train))
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = reflect_pad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=_use_bias(self.norm),
                    kernel_init=INIT, dtype=self.dtype)(h)
        h = Norm(self.norm, self.dtype)(h, train)
        return x + h


class ResnetGenerator(nn.Module):
    output_nc: int = 1
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "batch"
    use_dropout: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ub = _use_bias(self.norm)
        h = reflect_pad(x, 3)
        h = nn.Conv(self.ngf, (7, 7), padding="VALID", use_bias=ub,
                    kernel_init=INIT, dtype=self.dtype)(h)
        h = nn.relu(Norm(self.norm, self.dtype)(h, train))
        for i in range(2):  # downsampling
            mult = 2**i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=ub, kernel_init=INIT,
                        dtype=self.dtype)(h)
            h = nn.relu(Norm(self.norm, self.dtype)(h, train))
        for _ in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, self.norm, self.use_dropout,
                            self.dtype)(h, train)
        for i in range(2):  # upsampling
            mult = 2 ** (2 - i)
            h = ConvTranspose(self.ngf * mult // 2, 3, stride=2, padding=1,
                              output_padding=1, use_bias=ub, kernel_init=INIT,
                              dtype=self.dtype)(h)
            h = nn.relu(Norm(self.norm, self.dtype)(h, train))
        h = reflect_pad(h, 3)
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID", kernel_init=INIT,
                    dtype=self.dtype)(h)
        return jnp.tanh(h)


class UnetSkipBlock(nn.Module):
    outer_nc: int
    inner_nc: int
    submodule: Optional[Any] = None
    outermost: bool = False
    innermost: bool = False
    norm: str = "batch"
    use_dropout: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ub = _use_bias(self.norm)
        h = x
        if not self.outermost:
            h = nn.leaky_relu(h, 0.2)
        # downconv bias follows the norm rule even in the outermost block
        # (reference passes bias=use_bias to every downconv,
        # `pix2pix_model.py:763-764`); only the outermost UPconv defaults
        # to bias=True
        h = nn.Conv(self.inner_nc, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=ub, kernel_init=INIT, dtype=self.dtype)(h)
        if not (self.outermost or self.innermost):
            h = Norm(self.norm, self.dtype)(h, train)
        if self.submodule is not None:
            h = self.submodule(h, train)
        h = nn.relu(h)
        h = ConvTranspose(self.outer_nc, 4, stride=2, padding=1,
                          use_bias=ub or self.outermost, kernel_init=INIT,
                          dtype=self.dtype)(h)
        if self.outermost:
            return jnp.tanh(h)
        h = Norm(self.norm, self.dtype)(h, train)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        return jnp.concatenate([x, h], axis=-1)


class UnetGenerator(nn.Module):
    output_nc: int = 1
    num_downs: int = 8
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        block = UnetSkipBlock(self.ngf * 8, self.ngf * 8, innermost=True,
                              norm=self.norm, dtype=self.dtype)
        for _ in range(self.num_downs - 5):
            block = UnetSkipBlock(self.ngf * 8, self.ngf * 8, submodule=block,
                                  norm=self.norm, use_dropout=self.use_dropout,
                                  dtype=self.dtype)
        block = UnetSkipBlock(self.ngf * 4, self.ngf * 8, submodule=block,
                              norm=self.norm, dtype=self.dtype)
        block = UnetSkipBlock(self.ngf * 2, self.ngf * 4, submodule=block,
                              norm=self.norm, dtype=self.dtype)
        block = UnetSkipBlock(self.ngf, self.ngf * 2, submodule=block,
                              norm=self.norm, dtype=self.dtype)
        block = UnetSkipBlock(self.output_nc, self.ngf, submodule=block,
                              outermost=True, norm=self.norm, dtype=self.dtype)
        return block(x, train)


class NLayerDiscriminator(nn.Module):
    """70x70 PatchGAN (reference `pix2pix_model.py:803-859`)."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ub = _use_bias(self.norm)
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    kernel_init=INIT, dtype=self.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2**n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=ub, kernel_init=INIT,
                        dtype=self.dtype)(h)
            h = nn.leaky_relu(Norm(self.norm, self.dtype)(h, train), 0.2)
        nf = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1),
                    padding=[(1, 1), (1, 1)], use_bias=ub, kernel_init=INIT,
                    dtype=self.dtype)(h)
        h = nn.leaky_relu(Norm(self.norm, self.dtype)(h, train), 0.2)
        return nn.Conv(1, (4, 4), padding=[(1, 1), (1, 1)], kernel_init=INIT,
                       dtype=self.dtype)(h)


class PixelDiscriminator(nn.Module):
    """1x1 PixelGAN (reference `pix2pix_model.py:862-880`)."""

    ndf: int = 64
    norm: str = "batch"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ub = _use_bias(self.norm)
        h = nn.Conv(self.ndf, (1, 1), kernel_init=INIT, dtype=self.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.ndf * 2, (1, 1), use_bias=ub, kernel_init=INIT,
                    dtype=self.dtype)(h)
        h = nn.leaky_relu(Norm(self.norm, self.dtype)(h, train), 0.2)
        return nn.Conv(1, (1, 1), use_bias=ub, kernel_init=INIT,
                       dtype=self.dtype)(h)


def define_g(net_g: str, output_nc: int, ngf: int = 64, norm: str = "batch",
             use_dropout: bool = False, dtype=None) -> nn.Module:
    """Generator factory (reference `pix2pix_model.py:443-494`). ``dtype``
    sets the compute dtype (bf16 mixed precision); params stay f32."""
    if net_g == "resnet_9blocks":
        return ResnetGenerator(output_nc, ngf, 9, norm, use_dropout, dtype)
    if net_g == "unet_256":
        return UnetGenerator(output_nc, 8, ngf, norm, use_dropout, dtype)
    raise NotImplementedError(f"Generator model name [{net_g}] is not recognized")


def define_d(net_d: str, ndf: int = 64, n_layers_d: int = 3,
             norm: str = "batch", dtype=None) -> nn.Module:
    """Discriminator factory (reference `pix2pix_model.py:497-527`)."""
    if net_d == "basic":
        return NLayerDiscriminator(ndf, 3, norm, dtype)
    if net_d == "n_layers":
        return NLayerDiscriminator(ndf, n_layers_d, norm, dtype)
    if net_d == "pixel":
        return PixelDiscriminator(ndf, norm, dtype)
    raise NotImplementedError(f"Discriminator model name [{net_d}] is not recognized")


@dataclasses.dataclass(frozen=True)
class GANLoss:
    """vanilla (BCE-with-logits) | lsgan (MSE) | wgangp objectives
    (reference `pix2pix_model.py:533-599`)."""

    gan_mode: str = "vanilla"
    target_real: float = 1.0
    target_fake: float = 0.0

    def __call__(self, prediction: jax.Array, target_is_real: bool) -> jax.Array:
        if self.gan_mode == "vanilla":
            t = self.target_real if target_is_real else self.target_fake
            logp = jax.nn.log_sigmoid(prediction)
            lognp = jax.nn.log_sigmoid(-prediction)
            return -jnp.mean(t * logp + (1.0 - t) * lognp)
        if self.gan_mode == "lsgan":
            t = self.target_real if target_is_real else self.target_fake
            return jnp.mean(jnp.square(prediction - t))
        if self.gan_mode == "wgangp":
            return -jnp.mean(prediction) if target_is_real else jnp.mean(prediction)
        raise NotImplementedError(f"gan mode {self.gan_mode} not implemented")
