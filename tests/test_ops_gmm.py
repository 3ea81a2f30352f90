"""GMM stroke loss vs the reference prob-space formula (re-derived in numpy)."""

import numpy as np
import jax.numpy as jnp

from art_sbir_tpu.ops import gmm


def _np_reference_loss(y, target, num_mixture, use_mask):
    """Prob-space computation mirroring reference training_utils.py:22-71."""

    def softmax(x, axis):
        e = np.exp(x - x.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)

    pen_logits = y[..., :3].reshape(-1, 3)
    rest = y[..., 3:]
    pi, mu1, mu2, s1, s2, corr = np.split(rest, 6, axis=-1)
    pi = softmax(pi, -1).reshape(-1, num_mixture)
    mu1, mu2 = mu1.reshape(-1, num_mixture), mu2.reshape(-1, num_mixture)
    s1, s2 = np.exp(s1).reshape(-1, num_mixture), np.exp(s2).reshape(-1, num_mixture)
    corr = np.tanh(corr).reshape(-1, num_mixture)

    t = target.reshape(-1, 5)
    x1, x2 = t[:, 0:1], t[:, 1:2]
    pen = t[:, 2:5]

    norm1, norm2 = x1 - mu1, x2 - mu2
    s1s2 = s1 * s2
    z = (norm1 / s1) ** 2 + (norm2 / s2) ** 2 - 2 * corr * norm1 * norm2 / s1s2
    neg_rho = 1 - corr**2
    pdf = np.exp(-z / (2 * neg_rho)) / (2 * np.pi * s1s2 * np.sqrt(neg_rho))

    mix = (pdf * pi).sum(-1)
    nll = -np.log(mix + 1e-6)

    logp = pen_logits - pen_logits.max(-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    ce = -logp[np.arange(len(t)), pen.argmax(-1)]

    per = nll + ce
    if use_mask:
        per = (1.0 - pen[:, 2]) * per
    return per.mean()


def _random_case(rng, use_mask):
    B, T, M = 4, 11, 20
    y = rng.standard_normal((B, T, 6 * M + 3)).astype(np.float32) * 0.5
    target = np.zeros((B, T, 5), np.float32)
    target[..., :2] = rng.standard_normal((B, T, 2)) * 0.3
    states = rng.integers(0, 3, size=(B, T))
    for b in range(B):
        for t in range(T):
            target[b, t, 2 + states[b, t]] = 1.0
    params = gmm.split_decoder_output(jnp.array(y), M)
    total, _, _ = gmm.sketch_reconstruction_loss(params, jnp.array(target), use_mask)
    ref = _np_reference_loss(y.astype(np.float64), target.astype(np.float64), M, use_mask)
    np.testing.assert_allclose(float(total), ref, rtol=2e-5, atol=2e-5)


def test_gmm_loss_masked_matches_reference(rng):
    _random_case(rng, use_mask=True)


def test_gmm_loss_unmasked_matches_reference(rng):
    _random_case(rng, use_mask=False)


def test_gmm_loss_stable_in_far_tail(rng):
    """Where the reference underflows to -log(eps), ours must equal it, not NaN."""
    B, T, M = 2, 3, 20
    y = rng.standard_normal((B, T, 6 * M + 3)).astype(np.float32)
    target = np.zeros((B, T, 5), np.float32)
    target[..., 0] = 1e4  # absurdly far from any mixture mean
    target[..., 2] = 1.0
    params = gmm.split_decoder_output(jnp.array(y), M)
    total, nll, _ = gmm.sketch_reconstruction_loss(params, jnp.array(target), False)
    assert np.isfinite(float(total))
    np.testing.assert_allclose(float(nll), -np.log(1e-6), rtol=1e-6)


def test_kl_divergence_floor():
    mean = jnp.zeros((4, 8))
    log_var = jnp.zeros((4, 8))
    kl = gmm.kl_divergence_to_standard_normal(mean, log_var, kl_tolerance=0.2)
    np.testing.assert_allclose(float(kl), 0.2)  # exact N(0,1) -> kl 0 -> floored
