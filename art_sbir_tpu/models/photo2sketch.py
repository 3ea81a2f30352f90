"""Photo2Sketch VAE: CNN encoder + attention-LSTM stroke decoder.

TPU re-design of the reference VAE (reference `models.py:16-181`):

* ``EncoderCNN``: VGG16 features -> global max pool -> (mu, log_var)
  heads (`models.py:35-49`);
* ``AttentionCell2D``: additive attention over the 8x8x512 feature map
  (`models.py:148-181`);
* ``DecoderRNN2D``: the reference runs a *python loop* over <=101 LSTM steps
  per batch (`models.py:79-100` teacher-forced, `models.py:102-144` greedy
  autoregressive). Here both modes are single ``lax.scan`` programs — one
  compiled kernel each, no per-step dispatch;
* mixture parameters come back as a :class:`art_sbir_tpu.ops.gmm.GMMParams`
  (log-space; the loss is the logsumexp form in :mod:`art_sbir_tpu.ops.gmm`).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from art_sbir_tpu.models.layers import TorchLSTMCell
from art_sbir_tpu.models.vgg import VGGFeatures
from art_sbir_tpu.ops.gmm import GMMParams, split_decoder_output

START_TOKEN = (0.0, 0.0, 1.0, 0.0, 0.0)  # "move" start (reference models.py:67)


class EncoderCNN(nn.Module):
    z_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """NHWC image -> (feature_map, mu, log_var)."""
        feat = VGGFeatures(dtype=self.dtype, name="feature")(x)
        pooled = jnp.max(feat, axis=(1, 2))  # AdaptiveMaxPool2d(1)
        mu = nn.Dense(self.z_size, name="fc_mu")(pooled)
        log_var = nn.Dense(self.z_size, name="fc_std")(pooled)
        return feat, mu, log_var


class AttentionCell2D(nn.Module):
    """tanh(conv_f(feat) + W_h h) -> 1-logit softmax over HW positions ->
    weighted sum of the raw features (reference `models.py:148-181`).

    ``conv_f(feat)`` is loop-invariant across decoder timesteps (the
    reference recomputes it inside its per-step python loop,
    `models.py:159-166` — ~101x redundant conv work); :meth:`embed` hoists
    it so the scan body only pays the per-step Dense/softmax math. The
    split is bitwise-neutral: the same conv output is reused, so losses
    and goldens are unchanged."""

    embedding_size: int = 256

    def setup(self):
        self.conv_f = nn.Conv(self.embedding_size, (3, 3),
                              padding=[(1, 1), (1, 1)])
        self.conv_h = nn.Dense(self.embedding_size)
        self.conv_att = nn.Dense(1)

    def embed(self, feat: jax.Array):
        """Precompute the per-feature embedding + flat tokens ONCE."""
        b, fh, fw, c = feat.shape
        x_em = self.conv_f(feat).reshape(b, fh * fw, self.embedding_size)
        tokens = feat.reshape(b, fh * fw, c)
        return x_em, tokens

    def attend(self, x_em: jax.Array, tokens: jax.Array, h: jax.Array):
        """One timestep: additive scores against h, softmax, weighted sum."""
        g_em = self.conv_h(h)[:, None, :]
        scores = self.conv_att(jnp.tanh(x_em + g_em))  # (B, HW, 1)
        alpha = jax.nn.softmax(scores, axis=1)
        att = jnp.sum(alpha * tokens, axis=1)  # (B, C)
        return att, alpha[..., 0]

    def __call__(self, feat: jax.Array, h: jax.Array):
        x_em, tokens = self.embed(feat)
        return self.attend(x_em, tokens, h)


class DecoderRNN2D(nn.Module):
    z_size: int = 128
    dec_rnn_size: int = 512
    num_mixture: int = 20
    max_seq_len: int = 100

    def setup(self):
        self.fc_hc = nn.Dense(2 * self.dec_rnn_size, name="fc_hc")
        self.lstm = TorchLSTMCell(self.dec_rnn_size, name="lstm")
        self.fc_params = nn.Dense(6 * self.num_mixture + 3, name="fc_params")
        self.attention = AttentionCell2D(name="attention_cell")

    def _init_state(self, z: jax.Array):
        hc = jnp.tanh(self.fc_hc(z))
        h, c = jnp.split(hc, 2, axis=-1)
        return h, c

    def _step(self, carry, stroke, x_em, tokens):
        h, c = carry
        att, alpha = self.attention.attend(x_em, tokens, h)
        inp = jnp.concatenate([att, stroke], axis=-1)
        (h, c), out = self.lstm((h, c), inp)
        return (h, c), out, alpha

    def __call__(
        self, feat: jax.Array, z: jax.Array, sketch: jax.Array
    ) -> GMMParams:
        """Teacher-forced training decode.

        ``sketch`` (B, T, 5) targets; inputs are [start; sketch[:-1]]... the
        reference feeds [start; sketch] for T+1 steps (`models.py:80-87`) and
        predicts T+1 parameter sets. Returns GMMParams with leading (B, T+1).
        """
        b, t, _ = sketch.shape
        start = jnp.tile(jnp.asarray(START_TOKEN, sketch.dtype), (b, 1, 1))
        inputs = jnp.concatenate([start, sketch], axis=1)  # (B, T+1, 5)
        carry = self._init_state(z)
        x_em, tokens = self.attention.embed(feat)  # hoisted out of the scan

        _, hiddens = nn.scan(
            lambda mdl, c, x: mdl._scan_body(c, x, x_em, tokens),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(self, carry, inputs)
        y = self.fc_params(hiddens)  # (B, T+1, 6M+3)
        return split_decoder_output(y, self.num_mixture)

    def _scan_body(self, carry, x, x_em, tokens):
        carry, out, _ = self._step(carry, x, x_em, tokens)
        return carry, out

    def generate(self, feat: jax.Array, z: jax.Array, num_steps: int):
        """Greedy autoregressive decode (reference `models.py:102-144`):
        argmax mixture mean + argmax pen state per step. Returns
        (strokes (B, num_steps, 5), attention (B, num_steps, HW))."""
        b = z.shape[0]
        carry = self._init_state(z)
        start = jnp.tile(jnp.asarray(START_TOKEN, jnp.float32), (b, 1))
        x_em, tokens = self.attention.embed(feat)  # hoisted out of the scan

        _, (strokes, alphas) = nn.scan(
            lambda mdl, s, x: mdl._gen_body(s, x_em, tokens),
            variable_broadcast="params",
            split_rngs={"params": False},
            length=num_steps,
            out_axes=1,
        )(self, (carry, start), None)
        return strokes, alphas

    def _gen_body(self, state, x_em, tokens):
        carry, stroke = state
        b = stroke.shape[0]
        carry, out, alpha = self._step(carry, stroke, x_em, tokens)
        params = split_decoder_output(self.fc_params(out), self.num_mixture)
        pi_idx = jnp.argmax(params.log_pi, axis=-1)
        take = lambda m: jnp.take_along_axis(m, pi_idx[:, None], -1)[:, 0]
        pen_idx = jnp.argmax(params.pen_logits, axis=-1)
        nxt = jnp.zeros((b, 5))
        nxt = nxt.at[:, 0].set(take(params.mu1))
        nxt = nxt.at[:, 1].set(take(params.mu2))
        nxt = nxt.at[jnp.arange(b), pen_idx + 2].set(1.0)
        return (carry, nxt), (nxt, alpha)


class Photo2Sketch(nn.Module):
    """Full VAE (reference `models.py:16-32`). ``__call__`` = training path:
    encode, reparameterize, teacher-forced decode. ``generate`` = eval."""

    z_size: int = 128
    dec_rnn_size: int = 512
    num_mixture: int = 20
    max_seq_len: int = 100
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.image_encoder = EncoderCNN(z_size=self.z_size, dtype=self.dtype,
                                        name="Image_Encoder")
        self.sketch_decoder = DecoderRNN2D(
            z_size=self.z_size, dec_rnn_size=self.dec_rnn_size,
            num_mixture=self.num_mixture, max_seq_len=self.max_seq_len,
            name="Sketch_Decoder",
        )

    def __call__(self, image: jax.Array, sketch: jax.Array, rng: jax.Array):
        feat, mu, log_var = self.image_encoder(image)
        std = jnp.exp(0.5 * log_var)
        z = mu + std * jax.random.normal(rng, mu.shape)
        params = self.sketch_decoder(feat, z, sketch)
        return params, mu, log_var

    def generate(self, image: jax.Array, rng: jax.Array, num_steps: int,
                 sample_z: bool = False):
        feat, mu, log_var = self.image_encoder(image)
        z = mu
        if sample_z:
            z = mu + jnp.exp(0.5 * log_var) * jax.random.normal(rng, mu.shape)
        return self.sketch_decoder.generate(feat, z, num_steps)
