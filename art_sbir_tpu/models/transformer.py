"""CLIP transformer leftovers: fp16-safe LayerNorm, QuickGELU, and the
ResidualAttentionBlock. Present for parity with the reference model zoo
(reference `models.py:382-417`) — the reference defines them but wires no
ViT path; they are fully functional here (and reusable for a ViT encoder).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) (reference `models.py:391-393`)."""
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormFp32(nn.Module):
    """LayerNorm computed in float32 regardless of activation dtype, cast
    back (reference `models.py:382-388`)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig = x.dtype
        out = nn.LayerNorm(epsilon=self.epsilon)(x.astype(jnp.float32))
        return out.astype(orig)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block with QuickGELU MLP (reference
    `models.py:396-417`). Input (B, T, D); optional additive attn_mask."""

    d_model: int
    n_head: int

    @nn.compact
    def __call__(self, x: jax.Array,
                 attn_mask: Optional[jax.Array] = None) -> jax.Array:
        h = LayerNormFp32(name="ln_1")(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=self.d_model, name="attn"
        )
        mask = None
        if attn_mask is not None:
            # additive float mask -> boolean keep-mask for flax
            mask = (attn_mask > -1.0)[None, None]
        x = x + attn(h, h, mask=mask)
        h = LayerNormFp32(name="ln_2")(x)
        h = nn.Dense(self.d_model * 4, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.d_model, name="c_proj")(h)
        return x + h
