"""Gaussian-mixture stroke losses for the Photo2Sketch VAE decoder.

Numerically-stabilized reformulation of the reference GMM NLL (reference
`semiSupervised_utils/training_utils.py:5-71`): the reference evaluates the
bivariate normal *density* (Graves 2013, eq. 24), mixes in probability space,
and takes ``-log(sum + 1e-6)``. Here the mixture is computed in log space via
logsumexp and the reference's ``+1e-6`` floor is folded in exactly with
``logaddexp(log_mix, log(1e-6))`` — identical values, no underflow, and no
NaN path (the reference just prints "Catched" on NaN,
`training_utils.py:37-38`).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

LOG_EPS = math.log(1e-6)


class GMMParams(NamedTuple):
    """Mixture parameters, each (..., M); pen_logits (..., 3)."""

    log_pi: jax.Array
    mu1: jax.Array
    mu2: jax.Array
    log_sigma1: jax.Array
    log_sigma2: jax.Array
    corr: jax.Array
    pen_logits: jax.Array


def split_decoder_output(y: jax.Array, num_mixture: int) -> GMMParams:
    """Split raw decoder output (..., 6*M + 3) into mixture params.

    Layout matches the reference decoder head (reference `models.py:91-100`):
    first 3 channels pen logits, then 6 chunks of M: pi, mu1, mu2, sigma1,
    sigma2, corr. Sigmas are produced in log space here; pi in log space via
    log_softmax (the reference softmaxes then multiplies densities).
    """
    pen_logits = y[..., 0:3]
    rest = y[..., 3:]
    z_pi, mu1, mu2, ls1, ls2, raw_corr = jnp.split(rest, 6, axis=-1)
    return GMMParams(
        log_pi=jax.nn.log_softmax(z_pi, axis=-1),
        mu1=mu1,
        mu2=mu2,
        log_sigma1=ls1,
        log_sigma2=ls2,
        corr=jnp.tanh(raw_corr),
        pen_logits=pen_logits,
    )


def bivariate_normal_logpdf(
    x1: jax.Array,
    x2: jax.Array,
    mu1: jax.Array,
    mu2: jax.Array,
    log_s1: jax.Array,
    log_s2: jax.Array,
    rho: jax.Array,
) -> jax.Array:
    """log of Graves eq. 24 (reference `training_utils.py:5-19`)."""
    z1 = (x1 - mu1) * jnp.exp(-log_s1)
    z2 = (x2 - mu2) * jnp.exp(-log_s2)
    neg_rho = 1.0 - jnp.square(rho)
    z = jnp.square(z1) + jnp.square(z2) - 2.0 * rho * z1 * z2
    log_denom = (
        math.log(2.0 * math.pi) + log_s1 + log_s2 + 0.5 * jnp.log(neg_rho)
    )
    return -z / (2.0 * neg_rho) - log_denom


def sketch_reconstruction_loss(
    params: GMMParams,
    target_stroke5: jax.Array,
    use_mask: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """GMM NLL over (dx, dy) + cross-entropy over the 3 pen states.

    ``target_stroke5`` is (..., 5): [dx, dy, p_down, p_up, p_end]. The mask
    variant zeroes steps after the end token via ``1 - p_end`` on the target
    (reference `training_utils.py:28,42`); the unmasked variant matches
    ``sketch_reconstruction_loss_withoutMask`` (`training_utils.py:48-71`).

    Returns (total_mean, stroke_nll_mean, pen_ce_mean) where total is the
    mean over every (batch, step) element, matching ``result.mean()``.
    """
    x1 = target_stroke5[..., 0:1]
    x2 = target_stroke5[..., 1:2]
    pen_target = target_stroke5[..., 2:5]

    log_comp = bivariate_normal_logpdf(
        x1, x2, params.mu1, params.mu2, params.log_sigma1, params.log_sigma2, params.corr
    )
    log_mix = jax.nn.logsumexp(params.log_pi + log_comp, axis=-1)
    # Exactly -log(sum_prob + 1e-6), computed stably.
    stroke_nll = -jnp.logaddexp(log_mix, LOG_EPS)

    pen_label = jnp.argmax(pen_target, axis=-1)
    log_probs = jax.nn.log_softmax(params.pen_logits, axis=-1)
    pen_ce = -jnp.take_along_axis(log_probs, pen_label[..., None], axis=-1)[..., 0]

    per_step = stroke_nll + pen_ce
    if use_mask:
        mask = 1.0 - pen_target[..., 2]
        per_step = mask * per_step

    return jnp.mean(per_step), jnp.mean(stroke_nll), jnp.mean(pen_ce)


def kl_divergence_to_standard_normal(
    mean: jax.Array, log_var: jax.Array, kl_tolerance: float = 0.0
) -> jax.Array:
    """KL(N(mean, exp(log_var)) || N(0, 1)) per batch mean, with the
    sketch-rnn kl_tolerance floor (reference `semiSupervised_main.py:48-51`)."""
    kl = -0.5 * jnp.mean(1.0 + log_var - jnp.square(mean) - jnp.exp(log_var))
    return jnp.maximum(kl, kl_tolerance)
