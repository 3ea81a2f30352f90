"""AdaIN style-transfer networks (Flax, NHWC).

The reference uses a VGG19-until-relu4_1 encoder with reflection padding and
a mirrored nearest-upsample decoder (reference `artwork_gen_utils/net.py:
6-92`); ``style_transfer`` re-normalizes content features to style stats at
relu4_1 and decodes (reference `artwork_gen.py:29-44`). The training-time
``Net`` content/style losses (`net.py:96-152`) are provided as pure
functions.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from art_sbir_tpu.models.layers import reflect_pad
from art_sbir_tpu.ops.adain import adaptive_instance_normalization, calc_mean_std

# channel plan of the reference encoder up to relu5_4; slice indices mark
# relu1_1, relu2_1, relu3_1, relu4_1 boundaries
_ENC_PLAN: Sequence[Tuple[int, bool]] = (
    # (features, maxpool_before)
    (64, False), (64, False),            # relu1_1, relu1_2
    (128, True), (128, False),           # relu2_1, relu2_2
    (256, True), (256, False), (256, False), (256, False),  # relu3_x
    (512, True),                         # relu4_1  <- style/content layer
)
_STAGE_ENDS = (1, 3, 7, 9)  # conv count after relu1_1, relu2_1, relu3_1, relu4_1


class AdaINEncoder(nn.Module):
    """Input 1x1 color-projection conv + VGG19 convs through relu4_1.

    ``capture`` returns the four relu*_1 activations for style losses.
    """

    @nn.compact
    def __call__(self, x: jax.Array, capture: bool = False):
        h = nn.Conv(3, (1, 1), name="proj")(x)
        captured: List[jax.Array] = []
        conv_i = 0
        for feats, pool in _ENC_PLAN:
            if pool:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = reflect_pad(h, 1)
            h = nn.Conv(feats, (3, 3), padding="VALID", name=f"conv{conv_i}")(h)
            h = nn.relu(h)
            conv_i += 1
            if conv_i in _STAGE_ENDS:
                captured.append(h)
        return captured if capture else h


class AdaINDecoder(nn.Module):
    """Mirror of the encoder: 3x3 reflect-pad convs + nearest 2x upsamples
    (reference `net.py:6-37`)."""

    plan: Sequence = ((256, True), (256, False), (256, False), (256, False),
                      (128, True), (128, False), (64, True), (64, False))

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        for i, (feats, upsample_after) in enumerate(self.plan):
            h = reflect_pad(h, 1)
            h = nn.Conv(feats, (3, 3), padding="VALID", name=f"conv{i}")(h)
            h = nn.relu(h)
            if upsample_after:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
        h = reflect_pad(h, 1)
        return nn.Conv(3, (3, 3), padding="VALID", name="out")(h)


def style_transfer(
    encoder_apply, decoder_apply, content: jax.Array, style: jax.Array,
    alpha: float = 1.0,
) -> jax.Array:
    """AdaIN inference (reference `artwork_gen.py:29-44`)."""
    content_feat = encoder_apply(content)
    style_feat = encoder_apply(style)
    t = adaptive_instance_normalization(content_feat, style_feat)
    t = alpha * t + (1.0 - alpha) * content_feat
    return decoder_apply(t)


def adain_losses(
    encoder_apply_capture, decoder_apply, content: jax.Array, style: jax.Array,
    alpha: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """(content_loss, style_loss) of the reference ``Net.forward``
    (`net.py:139-152`): MSE at relu4_1 vs the AdaIN target, plus mean/std
    MSEs at each relu*_1."""
    style_feats = encoder_apply_capture(style)
    content_feat = encoder_apply_capture(content)[-1]
    t = adaptive_instance_normalization(content_feat, style_feats[-1])
    t = alpha * t + (1.0 - alpha) * content_feat
    g = decoder_apply(t)
    g_feats = encoder_apply_capture(g)

    loss_c = jnp.mean(jnp.square(g_feats[-1] - t))
    loss_s = jnp.float32(0.0)
    for gf, sf in zip(g_feats, style_feats):
        gm, gs = calc_mean_std(gf)
        sm, ss = calc_mean_std(sf)
        loss_s += jnp.mean(jnp.square(gm - sm)) + jnp.mean(jnp.square(gs - ss))
    return loss_c, loss_s
