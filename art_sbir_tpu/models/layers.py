"""Shared neural building blocks with torch-parity semantics (NHWC).

These exist so reference checkpoints port weight-for-weight and so numeric
parity is testable against torch primitives: an LSTM cell with torch's gate
order, a ConvTranspose wrapper reproducing torch's (stride, padding,
output_padding) geometry, instance norm with torch defaults, and reflection
padding.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# BatchNorm running-stat momentum shared by the whole model zoo (torch
# BatchNorm2d default 0.1 decay = flax momentum 0.9). train.triplet's
# _forward3 derives its sequential-stats recombination from THIS constant —
# a model using a different momentum must not silently reuse it.
BN_MOMENTUM = 0.9


def reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    """nn.ReflectionPad2d(pad) on NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch InstanceNorm2d defaults: per-(N, C) spatial stats, biased var,
    no affine, no running stats. Stats are computed in f32 regardless of the
    compute dtype (bf16 spatial reductions lose ~3 digits); the result comes
    back in x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class TorchLSTMCell(nn.Module):
    """One LSTM step with torch's parametrization: gates = x W_ih^T + b_ih +
    h W_hh^T + b_hh, gate order (input, forget, cell, output)."""

    hidden_size: int

    @nn.compact
    def __call__(
        self, carry: Tuple[jax.Array, jax.Array], x: jax.Array
    ) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
        h, c = carry
        k = 1.0 / jnp.sqrt(self.hidden_size)
        init = nn.initializers.uniform(scale=2 * k)  # torch U(-k, k) shifted

        def dense(name, inp, features):
            kernel = self.param(f"{name}_kernel", init, (inp.shape[-1], features))
            bias = self.param(f"{name}_bias", init, (features,))
            # shift uniform(0, 2k) -> uniform(-k, k)
            return inp @ (kernel - k) + (bias - k)

        gates = dense("ih", x, 4 * self.hidden_size) + dense(
            "hh", h, 4 * self.hidden_size
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h_new = nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new


def torch_conv_transpose(
    x: jax.Array,
    kernel: jax.Array,
    stride: int,
    padding: int,
    output_padding: int = 0,
    bias: jax.Array | None = None,
) -> jax.Array:
    """torch ConvTranspose2d geometry on NHWC.

    ``kernel`` is (kh, kw, out_c, in_c) (transpose layout). Output size is
    (in-1)*s - 2p + k + op, achieved with lax.conv_transpose padding
    (k-1-p, k-1-p+op) and a flipped kernel.
    """
    kh = kernel.shape[0]
    lo = kh - 1 - padding
    hi = kh - 1 - padding + output_padding
    out = jax.lax.conv_transpose(
        x,
        kernel,
        strides=(stride, stride),
        padding=((lo, hi), (lo, hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    if bias is not None:
        out = out + bias
    return out


class ConvTranspose(nn.Module):
    """Module wrapper over :func:`torch_conv_transpose`."""

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(0.02)
    dtype: Optional[jnp.dtype] = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel_size, self.kernel_size, self.features, x.shape[-1]),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if self.dtype is not None:
            x, k = x.astype(self.dtype), k.astype(self.dtype)
            b = None if b is None else b.astype(self.dtype)
        return torch_conv_transpose(
            x, k, self.stride, self.padding, self.output_padding, b
        )
