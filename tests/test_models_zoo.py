"""Generative model zoo: shapes, torch-parity of the primitive layers, and
GAN objectives vs torch."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from art_sbir_tpu.models import layers as L
from art_sbir_tpu.models import pix2pix as P
from art_sbir_tpu.models.drawing import DrawingGenerator
from art_sbir_tpu.models.photo2sketch import Photo2Sketch
from art_sbir_tpu.ops.gmm import sketch_reconstruction_loss


def test_conv_transpose_matches_torch(rng):
    """k3 s2 p1 op1 and k4 s2 p1 — the two geometries pix2pix uses."""
    for k, s, p, op in [(3, 2, 1, 1), (4, 2, 1, 0)]:
        x = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
        w = rng.standard_normal((k, k, 3, 5)).astype(np.float32)  # (kh,kw,out,in)
        ours = np.asarray(
            L.torch_conv_transpose(jnp.array(x), jnp.array(w), s, p, op)
        )
        tconv = tnn.ConvTranspose2d(5, 3, k, stride=s, padding=p,
                                    output_padding=op, bias=False)
        # torch weight layout: (in, out, kh, kw)
        tconv.weight.data = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
        ref = tconv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
        ref = ref.detach().numpy().transpose(0, 2, 3, 1)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_lstm_cell_matches_torch(rng):
    hidden = 16
    cell = L.TorchLSTMCell(hidden)
    x = rng.standard_normal((3, 8)).astype(np.float32)
    h0 = rng.standard_normal((3, hidden)).astype(np.float32)
    c0 = rng.standard_normal((3, hidden)).astype(np.float32)
    vars_ = cell.init(jax.random.key(0), (jnp.array(h0), jnp.array(c0)), jnp.array(x))
    (h1, c1), _ = cell.apply(vars_, (jnp.array(h0), jnp.array(c0)), jnp.array(x))

    p = vars_["params"]
    k = 1.0 / np.sqrt(hidden)
    k = np.float32(k)
    tcell = tnn.LSTMCell(8, hidden)
    tcell.weight_ih.data = torch.from_numpy((np.asarray(p["ih_kernel"]) - k).T.copy())
    tcell.bias_ih.data = torch.from_numpy(np.asarray(p["ih_bias"]) - k)
    tcell.weight_hh.data = torch.from_numpy((np.asarray(p["hh_kernel"]) - k).T.copy())
    tcell.bias_hh.data = torch.from_numpy(np.asarray(p["hh_bias"]) - k)
    th, tc = tcell(torch.from_numpy(x), (torch.from_numpy(h0), torch.from_numpy(c0)))
    np.testing.assert_allclose(np.asarray(h1), th.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), tc.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 6, 6, 4)).astype(np.float32)
    ours = np.asarray(L.instance_norm(jnp.array(x)))
    ref = tnn.InstanceNorm2d(4)(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_gan_loss_matches_torch(rng):
    pred = rng.standard_normal((4, 1, 30, 30)).astype(np.float32)
    for mode, tloss in [("vanilla", tnn.BCEWithLogitsLoss()), ("lsgan", tnn.MSELoss())]:
        gl = P.GANLoss(mode)
        for real in (True, False):
            ours = float(gl(jnp.array(pred), real))
            target = torch.full((4, 1, 30, 30), 1.0 if real else 0.0)
            ref = tloss(torch.from_numpy(pred), target).item()
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_resnet_generator_shapes(rng):
    g = P.define_g("resnet_9blocks", output_nc=1)
    x = jnp.array(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    vars_ = jax.jit(g.init, static_argnames="train")(jax.random.key(0), x, train=False)
    out = jax.jit(g.apply, static_argnames="train")(vars_, x, train=False)
    assert out.shape == (1, 64, 64, 1)
    assert float(jnp.abs(out).max()) <= 1.0  # tanh


def test_unet_generator_shapes(rng):
    g = P.define_g("unet_256", output_nc=1)
    x = jnp.array(rng.standard_normal((1, 256, 256, 3)).astype(np.float32))
    vars_ = jax.jit(g.init, static_argnames="train")(jax.random.key(0), x, train=False)
    out = jax.jit(g.apply, static_argnames="train")(vars_, x, train=False)
    assert out.shape == (1, 256, 256, 1)


def test_patchgan_receptive_shapes(rng):
    d = P.define_d("basic")
    x = jnp.array(rng.standard_normal((2, 256, 256, 4)).astype(np.float32))
    vars_ = jax.jit(d.init, static_argnames="train")(jax.random.key(0), x, train=False)
    out = jax.jit(d.apply, static_argnames="train")(vars_, x, train=False)
    assert out.shape == (2, 30, 30, 1)  # 70x70 patch map for 256 input

    pix = P.define_d("pixel")
    vars_ = jax.jit(pix.init, static_argnames="train")(jax.random.key(0), x, train=False)
    assert jax.jit(pix.apply, static_argnames="train")(vars_, x, train=False).shape == (2, 256, 256, 1)


def test_drawing_generator_shapes(rng):
    g = DrawingGenerator()
    x = jnp.array(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    vars_ = jax.jit(g.init)(jax.random.key(0), x)
    out = jax.jit(g.apply)(vars_, x)
    assert out.shape == (1, 64, 64, 1)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0  # sigmoid


def test_photo2sketch_train_and_generate(rng):
    model = Photo2Sketch(z_size=16, dec_rnn_size=32, num_mixture=5, max_seq_len=12)
    img = jnp.array(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    sketch = jnp.array(rng.standard_normal((2, 12, 5)).astype(np.float32))
    vars_ = jax.jit(model.init)(jax.random.key(0), img, sketch, jax.random.key(1))
    params, mu, log_var = jax.jit(model.apply)(vars_, img, sketch, jax.random.key(2))
    assert params.mu1.shape == (2, 13, 5)  # T+1 steps, M mixtures
    assert mu.shape == (2, 16)
    total, nll, ce = sketch_reconstruction_loss(params, jnp.concatenate(
        [sketch, sketch[:, :1]], axis=1))
    assert np.isfinite(float(total))

    strokes, alphas = model.apply(
        vars_, img, jax.random.key(3), 12, method=model.generate
    )
    assert strokes.shape == (2, 12, 5)
    s = np.asarray(strokes)
    np.testing.assert_allclose(s[..., 2:].sum(-1), 1.0)  # one pen state per step
    assert alphas.shape == (2, 12, 4)  # 2x2 VGG16 feature map for 64px input
