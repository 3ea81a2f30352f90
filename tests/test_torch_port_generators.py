"""Weight-port mappings for the generator checkpoints: synthesized
reference-layout state dicts must fill our flax trees shape-exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from art_sbir_tpu.models import torch_port as TP


def _conv_sd(sd, prefix, i, o, k, bias=True, rng=None):
    sd[f"{prefix}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
    if bias:
        sd[f"{prefix}.bias"] = rng.standard_normal(o).astype(np.float32)


def test_port_vgg16_features(rng):
    from art_sbir_tpu.models.vgg import VGGFeatures

    sd = {}
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
             (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
             (512, 512), (512, 512)]
    for t, (i, o) in zip([0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28], chans):
        _conv_sd(sd, f"feature.{t}", i, o, 3, rng=rng)

    ported = TP.port_vgg16_features(sd)
    model = VGGFeatures()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.key(0), x)
    merged = TP.merge_into(vars_["params"], ported)
    assert jax.tree_util.tree_map(lambda a: a.shape, merged) == \
        jax.tree_util.tree_map(lambda a: a.shape, vars_["params"])
    out = model.apply({"params": merged}, x)
    assert np.isfinite(np.asarray(out)).all()


def test_port_adain(rng):
    from art_sbir_tpu.models.adain_net import AdaINDecoder, AdaINEncoder

    vgg_sd = {}
    _conv_sd(vgg_sd, "0", 3, 3, 1, rng=rng)
    enc_chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
                 (256, 256), (256, 256), (256, 256), (256, 512)]
    for t, (i, o) in zip([2, 5, 9, 12, 16, 19, 22, 25, 29], enc_chans):
        _conv_sd(vgg_sd, str(t), i, o, 3, rng=rng)

    dec_sd = {}
    dec_chans = [(512, 256), (256, 256), (256, 256), (256, 256), (256, 128),
                 (128, 128), (128, 64), (64, 64)]
    for t, (i, o) in zip([1, 5, 8, 11, 14, 18, 21, 25], dec_chans):
        _conv_sd(dec_sd, str(t), i, o, 3, rng=rng)
    _conv_sd(dec_sd, "28", 64, 3, 3, rng=rng)

    ported = TP.port_adain(vgg_sd, dec_sd)

    enc = AdaINEncoder()
    x = jnp.zeros((1, 64, 64, 3))
    enc_vars = jax.jit(enc.init)(jax.random.key(0), x)
    enc_merged = TP.merge_into(enc_vars["params"], ported["encoder"])
    feat = enc.apply({"params": enc_merged}, x)
    assert feat.shape[-1] == 512

    dec = AdaINDecoder()
    dec_vars = jax.jit(dec.init)(jax.random.key(1), feat)
    dec_merged = TP.merge_into(dec_vars["params"], ported["decoder"])
    out = dec.apply({"params": dec_merged}, feat)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("norm", ["batch", "instance"])
def test_port_resnet_generator(rng, norm):
    from art_sbir_tpu.models.pix2pix import ResnetGenerator

    ngf, nb = 8, 2
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.random(c).astype(np.float32) + 0.5

    use_bias = norm == "instance"
    _conv_sd(sd, "model.1", 3, ngf, 7, bias=use_bias, rng=rng)
    if norm == "batch":
        bn("model.2", ngf)
    _conv_sd(sd, "model.4", ngf, ngf * 2, 3, bias=use_bias, rng=rng)
    if norm == "batch":
        bn("model.5", ngf * 2)
    _conv_sd(sd, "model.7", ngf * 2, ngf * 4, 3, bias=use_bias, rng=rng)
    if norm == "batch":
        bn("model.8", ngf * 4)
    for b in range(nb):
        base = f"model.{10 + b}.conv_block"
        _conv_sd(sd, f"{base}.1", ngf * 4, ngf * 4, 3, bias=use_bias, rng=rng)
        _conv_sd(sd, f"{base}.6", ngf * 4, ngf * 4, 3, bias=use_bias, rng=rng)
        if norm == "batch":
            bn(f"{base}.2", ngf * 4)
            bn(f"{base}.7", ngf * 4)
    up0 = 10 + nb
    for t, (i, o) in zip([up0, up0 + 3], [(ngf * 4, ngf * 2), (ngf * 2, ngf)]):
        sd[f"model.{t}.weight"] = rng.standard_normal((i, o, 3, 3)).astype(np.float32)
        if use_bias:
            sd[f"model.{t}.bias"] = rng.standard_normal(o).astype(np.float32)
        if norm == "batch":
            bn(f"model.{t + 1}", o)
    _conv_sd(sd, f"model.{up0 + 7}", ngf, 1, 7, bias=True, rng=rng)

    params, stats = TP.port_resnet_generator(sd, n_blocks=nb)
    g = ResnetGenerator(output_nc=1, ngf=ngf, n_blocks=nb, norm=norm)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = jax.jit(g.init, static_argnames="train")(jax.random.key(0), x,
                                                     train=False)
    merged_p = TP.merge_into(vars_["params"], params)
    assert jax.tree_util.tree_map(lambda a: a.shape, merged_p) == \
        jax.tree_util.tree_map(lambda a: a.shape, vars_["params"])
    variables = {"params": merged_p}
    if norm == "batch":
        merged_s = TP.merge_into(vars_["batch_stats"], stats)
        variables["batch_stats"] = merged_s
    out = g.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()