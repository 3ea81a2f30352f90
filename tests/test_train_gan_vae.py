"""GAN and VAE jitted trainers on tiny shapes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from art_sbir_tpu.train.gan import Pix2Pix, Pix2PixConfig
from art_sbir_tpu.train.vae import VAEConfig, VAETrainer, kl_weight_at


def _gan_batch(rng, b=2, s=64):
    return {
        "A": jnp.array(rng.random((b, s, s, 3)).astype(np.float32)),
        "B": jnp.array(rng.random((b, s, s, 1)).astype(np.float32)),
    }


def test_pix2pix_step_runs_and_updates(rng):
    cfg = Pix2PixConfig(image_size=64, ngf=8, ndf=8)
    model = Pix2Pix(cfg, jax.random.key(0))
    batch = _gan_batch(rng)
    before = jax.tree_util.tree_leaves(model.g.params)[0].copy()
    losses = model.train_step(batch, jax.random.key(1))
    for k in ("G_GAN", "G_L1", "D_real", "D_fake", "G_total", "D_total"):
        assert np.isfinite(float(losses[k])), k
    after = jax.tree_util.tree_leaves(model.g.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_pix2pix_decoder_only_freezes_generator(rng):
    cfg = Pix2PixConfig(image_size=64, ngf=8, ndf=8)
    model = Pix2Pix(cfg, jax.random.key(0))
    batch = _gan_batch(rng)
    g_before = jax.tree_util.tree_leaves(model.g.params)[0].copy()
    d_before = jax.tree_util.tree_leaves(model.d.params)[0].copy()
    losses = model.train_step(batch, jax.random.key(1), decoder_only=True)
    assert float(losses["G_total"]) == 0.0
    np.testing.assert_array_equal(
        np.asarray(g_before), np.asarray(jax.tree_util.tree_leaves(model.g.params)[0])
    )
    assert not np.allclose(
        np.asarray(d_before), np.asarray(jax.tree_util.tree_leaves(model.d.params)[0])
    )


def test_pix2pix_single_forward_semantics(rng):
    """G's BN running stats advance exactly ONCE per step, through the same
    stochastic forward the D step saw (reference computes fake_B once,
    `pix2pix_model.py:294-322`): the post-step stats equal one train-mode
    forward of the *initial* G params with the step's dropout key."""
    cfg = Pix2PixConfig(image_size=64, ngf=8, ndf=8, use_dropout=True)
    model = Pix2Pix(cfg, jax.random.key(0))
    batch = _gan_batch(rng)
    # explicit copies: train_step donates g/d, deleting the originals
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    g0_params = copy(model.g.params)
    g0_stats = copy(model.g.batch_stats)
    step_rng = jax.random.key(7)
    model.train_step(batch, step_rng)
    _, expected_stats = model.net_g.apply(
        {"params": g0_params, "batch_stats": g0_stats}, batch["A"],
        train=True, mutable=["batch_stats"], rngs={"dropout": step_rng},
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        model.g.batch_stats, expected_stats["batch_stats"],
    )


def test_pix2pix_eval_and_generate(rng):
    cfg = Pix2PixConfig(image_size=64, ngf=8, ndf=8)
    model = Pix2Pix(cfg, jax.random.key(0))
    batch = _gan_batch(rng)
    losses = model.eval_losses(batch)
    assert np.isfinite(float(losses["G_total"]))
    fake = model.generate(batch["A"])
    assert fake.shape == (2, 64, 64, 1)


def test_vae_schedules():
    cfg = VAEConfig()
    w0 = float(kl_weight_at(cfg, 0))
    w_inf = float(kl_weight_at(cfg, 200000))
    np.testing.assert_allclose(w0, cfg.kl_weight_start, rtol=1e-5)
    assert w_inf > 0.99  # warms up toward kl_weight


def test_vae_trainer_step(rng):
    cfg = VAEConfig(z_size=8, dec_rnn_size=16, num_mixture=4, max_seq_len=10,
                    image_size=64)
    trainer = VAETrainer(cfg, jax.random.key(0))
    batch = {
        "photo": jnp.array(rng.standard_normal((2, 64, 64, 3)).astype(np.float32)),
        "sketch_vector": jnp.array(
            rng.standard_normal((2, 10, 5)).astype(np.float32)
        ),
        "length": jnp.array([8, 9]),
    }
    losses = trainer.train_step(batch, jax.random.key(1))
    for k in ("total_loss", "kl_loss", "reconstruction_loss"):
        assert np.isfinite(float(losses[k])), k
    assert float(losses["kl_loss"]) >= cfg.kl_tolerance - 1e-6

    l2 = trainer.train_step(batch, jax.random.key(2))
    assert np.isfinite(float(l2["total_loss"]))

    strokes, alphas = trainer.generate(batch["photo"], jax.random.key(3),
                                       num_steps=11)
    assert strokes.shape == (2, 11, 5)


def test_pix2pix_bf16_mixed_precision(rng):
    """--bf16 mode: identical init values (params are created in f32
    param_dtype either way), f32 master state throughout (params, opt
    state, BN running stats), finite losses tracking the f32 step to bf16
    tolerance, and f32 sample output close to the f32 model's."""
    batch = _gan_batch(rng)
    m32 = Pix2Pix(Pix2PixConfig(image_size=64, ngf=8, ndf=8),
                  jax.random.key(0))
    mbf = Pix2Pix(Pix2PixConfig(image_size=64, ngf=8, ndf=8, bf16=True),
                  jax.random.key(0))

    for a, b in zip(jax.tree_util.tree_leaves(m32.g.params),
                    jax.tree_util.tree_leaves(mbf.g.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    l32 = m32.train_step(batch, jax.random.key(1))
    lbf = mbf.train_step(batch, jax.random.key(1))
    for k in ("G_GAN", "G_L1", "D_real", "D_fake"):
        assert np.isfinite(float(lbf[k])), k
        assert float(lbf[k]) == pytest.approx(float(l32[k]), rel=0.1, abs=0.05), k

    for state in (mbf.g, mbf.d):
        for leaf in jax.tree_util.tree_leaves(
                (state.params, state.batch_stats, state.opt_state)):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32, leaf.dtype

    out32 = np.asarray(m32.generate(batch["A"]))
    outbf = np.asarray(mbf.generate(batch["A"]))
    assert outbf.dtype == np.float32
    # one-step-trained nets, tanh outputs in [-1, 1]: bf16 quantization
    # noise accumulated over the net stays small
    assert np.abs(out32 - outbf).mean() < 0.05


def test_vae_bf16_encoder_tracks_f32(rng):
    """--bf16 VAE mode: VGG encoder computes in bfloat16, decoder/GMM/loss
    stay f32; params f32 with identical init; one train step's losses track
    the f32 step to bf16 tolerance."""
    from art_sbir_tpu.train.vae import VAEConfig, VAETrainer

    mk = lambda bf: VAETrainer(
        VAEConfig(z_size=8, dec_rnn_size=16, num_mixture=3, max_seq_len=12,
                  image_size=64, bf16_encoder=bf), jax.random.key(0))
    t32, tbf = mk(False), mk(True)
    for a, b in zip(jax.tree_util.tree_leaves(t32.state.params),
                    jax.tree_util.tree_leaves(tbf.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.dtype == np.float32

    batch = {
        "photo": jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32)),
        "sketch_vector": jnp.asarray(
            rng.random((2, 12, 5)).astype(np.float32)),
    }
    l32 = t32.train_step(batch, jax.random.key(1))
    lbf = tbf.train_step(batch, jax.random.key(1))
    for k in l32:
        assert np.isfinite(float(lbf[k])), k
        assert float(lbf[k]) == pytest.approx(float(l32[k]), rel=0.05,
                                              abs=0.02), k
