"""ModifiedResNet structural and numerical checks.

The attention-pool math is cross-checked against torch's
multi_head_attention_forward with identical weights; convolution/bn layers
are standard flax primitives (covered upstream), so model-level checks focus
on shapes, dtype policy, and BN train/eval behavior.
"""

import numpy as np
import jax
import jax.numpy as jnp

from art_sbir_tpu.models.resnet import (
    AttentionPool2d,
    ModifiedResNet,
    ModifiedResNetWithClassification,
)

TINY = dict(layers=(1, 1, 1, 1), output_dim=32, heads=4, input_resolution=64, width=8)


def test_tiny_resnet_shapes(rng):
    model = ModifiedResNet(**TINY)
    x = jnp.array(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    vars_ = jax.jit(model.init, static_argnames="train")(jax.random.key(0), x, train=False)
    out = jax.jit(model.apply, static_argnames="train")(vars_, x, train=False)
    assert out.shape == (2, 32)
    assert out.dtype == jnp.float32


def test_classification_heads(rng):
    model = ModifiedResNetWithClassification(num_classes=5, num_classes2=3, **TINY)
    x = jnp.array(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    vars_ = model.init(jax.random.key(0), x, train=False)
    feat, c1, c2 = model.apply(vars_, x, train=False)
    assert feat.shape == (2, 32) and c1.shape == (2, 5) and c2.shape == (2, 3)


def test_batchnorm_train_updates_stats(rng):
    model = ModifiedResNet(**TINY)
    x = jnp.array(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    vars_ = model.init(jax.random.key(0), x, train=False)
    out, mut = model.apply(vars_, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(vars_["batch_stats"])
    new = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_attnpool_matches_torch_mha(rng):
    """Same weights through torch F.multi_head_attention_forward."""
    import torch
    import torch.nn.functional as F

    b, h, w, c, heads, out_dim = 2, 4, 4, 16, 4, 8
    pool = AttentionPool2d(
        embed_dim=c, num_heads=heads, output_dim=out_dim, spacial_dim=h
    )
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    vars_ = pool.init(jax.random.key(1), jnp.array(x))
    ours = np.asarray(pool.apply(vars_, jnp.array(x)))

    p = vars_["params"]
    pos = np.asarray(p["positional_embedding"])

    # torch reference path: tokens (HW+1, B, C), all-token query then row 0
    tok = x.reshape(b, h * w, c).transpose(1, 0, 2)  # (HW, B, C)
    tok = np.concatenate([tok.mean(0, keepdims=True), tok], 0)
    tok = tok + pos[:, None, :]
    tok_t = torch.from_numpy(tok)

    def lin(name):
        k = np.asarray(p[name]["kernel"])  # (in, out)
        bi = np.asarray(p[name]["bias"])
        return torch.from_numpy(k.T.copy()), torch.from_numpy(bi)

    qw, qb = lin("q_proj")
    kw, kb = lin("k_proj")
    vw, vb = lin("v_proj")
    cw, cb = lin("c_proj")
    ref, _ = F.multi_head_attention_forward(
        query=tok_t[:1], key=tok_t, value=tok_t,
        embed_dim_to_check=c, num_heads=heads,
        q_proj_weight=qw, k_proj_weight=kw, v_proj_weight=vw,
        in_proj_weight=None,
        in_proj_bias=torch.cat([qb, kb, vb]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
        out_proj_weight=cw, out_proj_bias=cb,
        use_separate_proj_weight=True, training=False, need_weights=False,
    )
    ref = ref.squeeze(0).detach().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_bfloat16_compute_path(rng):
    model = ModifiedResNet(dtype=jnp.bfloat16, **{k: v for k, v in TINY.items()})
    x = jnp.array(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    vars_ = model.init(jax.random.key(0), x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out.dtype == jnp.float32  # cast back at the boundary
    assert np.isfinite(np.asarray(out)).all()
    # params stay f32
    kinds = {l.dtype for l in jax.tree_util.tree_leaves(vars_["params"])}
    assert kinds == {np.dtype("float32")}
