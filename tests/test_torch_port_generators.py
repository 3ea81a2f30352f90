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

def _unet_sd(rng, num_downs=6, ngf=4, input_nc=3, output_nc=1, norm="batch"):
    """Synthesize a reference-layout UnetGenerator state dict
    (`pix2pix_model.py:701-800`): keys nest as model.model.<i>.model...,
    built here from the outermost level in."""
    sd = {}
    use_bias = norm == "instance"

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = 0.1 * rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.random(c).astype(np.float32) + 0.5

    def tconv(prefix, i, o, bias):
        sd[f"{prefix}.weight"] = (rng.standard_normal((i, o, 4, 4)) /
                                  np.sqrt(16 * i)).astype(np.float32)
        if bias:
            sd[f"{prefix}.bias"] = 0.1 * rng.standard_normal(o).astype(np.float32)

    def conv(prefix, i, o, bias):
        sd[f"{prefix}.weight"] = (rng.standard_normal((o, i, 4, 4)) /
                                  np.sqrt(16 * i)).astype(np.float32)
        if bias:
            sd[f"{prefix}.bias"] = 0.1 * rng.standard_normal(o).astype(np.float32)

    prefix = "model.model"
    # channel plan outermost -> innermost: outer_nc/inner_nc per level
    plan = [(output_nc, ngf, input_nc)]
    oc, ic = ngf, ngf * 2
    for _ in range(3):
        plan.append((oc, ic, None))
        oc, ic = ic, min(ic * 2, ngf * 8)
    for _ in range(num_downs - 4):
        plan.append((ngf * 8, ngf * 8, None))
    for level, (outer, inner, in_nc) in enumerate(plan):
        outermost = level == 0
        innermost = level == num_downs - 1
        in_ch = in_nc if in_nc is not None else outer
        if outermost:
            conv(f"{prefix}.0", in_ch, inner, use_bias)
            tconv(f"{prefix}.3", inner * 2, outer, True)
            prefix = f"{prefix}.1.model"
        elif innermost:
            conv(f"{prefix}.1", in_ch, inner, use_bias)
            tconv(f"{prefix}.3", inner, outer, use_bias)
            if norm == "batch":
                bn(f"{prefix}.4", outer)
        else:
            conv(f"{prefix}.1", in_ch, inner, use_bias)
            tconv(f"{prefix}.5", inner * 2, outer, use_bias)
            if norm == "batch":
                bn(f"{prefix}.2", inner)
                bn(f"{prefix}.6", outer)
            prefix = f"{prefix}.3.model"
    return sd


def _torch_unet_forward(sd, x, num_downs=6, norm="batch"):
    """Reference UnetGenerator forward in eval mode from functional torch
    ops (skip-concat semantics of `pix2pix_model.py:796-800`)."""
    import torch
    import torch.nn.functional as F

    t = lambda k: torch.from_numpy(np.asarray(sd[k]))
    tb = lambda k: t(k) if k in sd else None

    def bn(h, p):
        return F.batch_norm(h, t(f"{p}.running_mean"), t(f"{p}.running_var"),
                            t(f"{p}.weight"), t(f"{p}.bias"), training=False,
                            eps=1e-5)

    def inorm(h):
        return F.instance_norm(h, eps=1e-5)

    def norm_f(h, p):
        return bn(h, p) if norm == "batch" else inorm(h)

    def block(x, prefix, level):
        outermost = level == 0
        innermost = level == num_downs - 1
        if outermost:
            h = F.conv2d(x, t(f"{prefix}.0.weight"), tb(f"{prefix}.0.bias"),
                         stride=2, padding=1)
            h = block(h, f"{prefix}.1.model", level + 1)
            h = F.relu(h)
            h = F.conv_transpose2d(h, t(f"{prefix}.3.weight"),
                                   tb(f"{prefix}.3.bias"), stride=2, padding=1)
            return torch.tanh(h)
        h = F.leaky_relu(x, 0.2)
        h = F.conv2d(h, t(f"{prefix}.1.weight"), tb(f"{prefix}.1.bias"),
                     stride=2, padding=1)
        if innermost:
            h = F.relu(h)
            h = F.conv_transpose2d(h, t(f"{prefix}.3.weight"),
                                   tb(f"{prefix}.3.bias"), stride=2, padding=1)
            h = norm_f(h, f"{prefix}.4")
        else:
            h = norm_f(h, f"{prefix}.2")
            h = block(h, f"{prefix}.3.model", level + 1)
            h = F.relu(h)
            h = F.conv_transpose2d(h, t(f"{prefix}.5.weight"),
                                   tb(f"{prefix}.5.bias"), stride=2, padding=1)
            h = norm_f(h, f"{prefix}.6")
        return torch.cat([x, h], 1)

    return block(x, "model.model", 0)


@pytest.mark.parametrize("norm", ["batch", "instance"])
def test_port_unet_generator_functional_parity(rng, norm):
    """The recursive UnetGenerator walk (reference
    `pix2pix_model.py:701-800`, `utils.py` pix2pix dispatch): ported weights
    reproduce the torch forward exactly (eval mode, f32)."""
    import torch

    from art_sbir_tpu.models.pix2pix import UnetGenerator

    num_downs, ngf = 6, 4
    sd = _unet_sd(rng, num_downs, ngf, norm=norm)
    params, stats = TP.port_unet_generator(sd, num_downs)

    g = UnetGenerator(output_nc=1, num_downs=num_downs, ngf=ngf, norm=norm)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    vars_ = jax.jit(g.init, static_argnames="train")(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    merged_p = TP.merge_into(vars_["params"], params)
    assert jax.tree_util.tree_map(lambda a: a.shape, merged_p) == \
        jax.tree_util.tree_map(lambda a: a.shape, vars_["params"])
    variables = {"params": merged_p}
    if norm == "batch":
        variables["batch_stats"] = TP.merge_into(vars_["batch_stats"], stats)
    ours = np.asarray(g.apply(variables, jnp.asarray(x), train=False))

    with torch.no_grad():
        ref = _torch_unet_forward(
            sd, torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
            num_downs, norm,
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
