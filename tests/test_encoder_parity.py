"""Whole-encoder numerical parity vs the reference ModifiedResNet.

The strongest recall-parity evidence obtainable without the real corpora:
the reference forward (`/root/reference/models.py:191-360` — 3-conv stem,
anti-aliased bottlenecks, QKV attention pooling, optional classifier heads)
is composed here from torch *functional* primitives, driven by the same
synthesized reference-layout state dict that `torch_port` ingests; the Flax
model with the ported weights must produce the same embeddings (f32,
rtol <= 1e-4). If these agree, identical checkpoints yield identical
gallery/query embeddings, hence identical distances, ranks, and recall@K.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from art_sbir_tpu.models import torch_port as TP
from art_sbir_tpu.models.resnet import (
    ModifiedResNet,
    ModifiedResNetWithClassification,
)
from tests.test_torch_port import _fake_resnet_state_dict

LAYERS = (2, 1, 1, 1)  # multi-block first stage exercises non-downsample blocks
WIDTH = 8
HEADS = 4
OUT_DIM = 32
RES = 64  # attnpool spacial_dim = RES // 32 = 2, matching the fake state dict


def _tame(sd):
    """Rescale the synthesized weights so activations stay O(1) through the
    deep composition — raw N(0,1) tensors compound to ~1e13 by the head,
    where float32 comparisons are meaningless."""
    out = {}
    for k, v in sd.items():
        if k.endswith("running_var"):
            out[k] = 1.0 + 0.1 * (v - 1.0)
        elif k.endswith("running_mean"):
            out[k] = 0.1 * v
        elif f"{k.rsplit('.', 1)[0]}.running_mean" in sd:
            # BN affine: scale near 1, bias small
            out[k] = (1.0 + 0.1 * v if k.endswith("weight") else 0.1 * v
                      ).astype(np.float32)
        elif k.endswith("weight") and v.ndim >= 2:
            fan_in = int(np.prod(v.shape[1:]))
            out[k] = (v / np.sqrt(fan_in)).astype(np.float32)
        else:
            out[k] = 0.1 * v
    return out


def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key]))


def _bn(x, sd, p):
    return F.batch_norm(
        x, _t(sd, f"{p}.running_mean"), _t(sd, f"{p}.running_var"),
        _t(sd, f"{p}.weight"), _t(sd, f"{p}.bias"), training=False, eps=1e-5,
    )


def _bottleneck(x, sd, p, stride):
    """Reference Bottleneck semantics (`models.py:191-236`): stride lives in
    an AvgPool after conv2; downsample = avgpool -> 1x1 conv -> BN."""
    out = F.relu(_bn(F.conv2d(x, _t(sd, f"{p}.conv1.weight")), sd, f"{p}.bn1"))
    out = F.relu(_bn(F.conv2d(out, _t(sd, f"{p}.conv2.weight"), padding=1),
                     sd, f"{p}.bn2"))
    if stride > 1:
        out = F.avg_pool2d(out, stride)
    out = _bn(F.conv2d(out, _t(sd, f"{p}.conv3.weight")), sd, f"{p}.bn3")
    identity = x
    if f"{p}.downsample.0.weight" in sd:
        identity = F.avg_pool2d(x, stride) if stride > 1 else x
        identity = _bn(
            F.conv2d(identity, _t(sd, f"{p}.downsample.0.weight")),
            sd, f"{p}.downsample.1",
        )
    return F.relu(out + identity)


def _attnpool(x, sd, heads):
    """Reference AttentionPool2d (`models.py:239-272`): mean token prepended,
    learned positional embedding, single-query MHA with separate q/k/v/c."""
    n, c, h, w = x.shape
    x = x.flatten(start_dim=2).permute(2, 0, 1)
    x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
    x = x + _t(sd, "attnpool.positional_embedding")[:, None, :]
    out, _ = F.multi_head_attention_forward(
        query=x[:1], key=x, value=x,
        embed_dim_to_check=x.shape[-1],
        num_heads=heads,
        q_proj_weight=_t(sd, "attnpool.q_proj.weight"),
        k_proj_weight=_t(sd, "attnpool.k_proj.weight"),
        v_proj_weight=_t(sd, "attnpool.v_proj.weight"),
        in_proj_weight=None,
        in_proj_bias=torch.cat([
            _t(sd, "attnpool.q_proj.bias"),
            _t(sd, "attnpool.k_proj.bias"),
            _t(sd, "attnpool.v_proj.bias"),
        ]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=_t(sd, "attnpool.c_proj.weight"),
        out_proj_bias=_t(sd, "attnpool.c_proj.bias"),
        use_separate_proj_weight=True, training=False, need_weights=False,
    )
    return out.squeeze(0)


def torch_reference_forward(sd, x_nchw, layers=LAYERS, heads=HEADS):
    """Reference ModifiedResNet.forward (`models.py:344-360`) from
    functional torch ops in eval mode."""
    x = torch.from_numpy(x_nchw)
    x = F.relu(_bn(F.conv2d(x, _t(sd, "conv1.weight"), stride=2, padding=1),
                   sd, "bn1"))
    x = F.relu(_bn(F.conv2d(x, _t(sd, "conv2.weight"), padding=1), sd, "bn2"))
    x = F.relu(_bn(F.conv2d(x, _t(sd, "conv3.weight"), padding=1), sd, "bn3"))
    x = F.avg_pool2d(x, 2)
    for stage, blocks in enumerate(layers, start=1):
        stride = 1 if stage == 1 else 2
        for b in range(blocks):
            x = _bottleneck(x, sd, f"layer{stage}.{b}", stride if b == 0 else 1)
    return _attnpool(x, sd, heads)


def _flax_embed(sd, x_nhwc):
    model = ModifiedResNet(layers=LAYERS, output_dim=OUT_DIM, heads=HEADS,
                           input_resolution=RES, width=WIDTH)
    variables = model.init(jax.random.key(0), jnp.zeros((1, RES, RES, 3)),
                           train=False)
    params, stats = TP.port_modified_resnet(sd, LAYERS)
    return model.apply(
        {"params": TP.merge_into(variables["params"], params),
         "batch_stats": TP.merge_into(variables["batch_stats"], stats)},
        jnp.asarray(x_nhwc), train=False,
    )


def test_whole_encoder_embedding_parity(rng):
    sd = _tame(_fake_resnet_state_dict(rng, LAYERS, width=WIDTH, out_dim=OUT_DIM))
    x = rng.standard_normal((2, RES, RES, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_reference_forward(sd, x.transpose(0, 3, 1, 2).copy()).numpy()
    ours = np.asarray(_flax_embed(sd, x), np.float32)
    assert ours.shape == ref.shape == (2, OUT_DIM)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_whole_encoder_distance_and_rank_parity(rng):
    """Embedding parity implies retrieval parity: distances and ranks from
    the two implementations agree on a small synthetic gallery."""
    sd = _tame(_fake_resnet_state_dict(rng, LAYERS, width=WIDTH, out_dim=OUT_DIM))
    gallery_imgs = rng.standard_normal((6, RES, RES, 3)).astype(np.float32)
    query_imgs = gallery_imgs[:3] + 0.05 * rng.standard_normal(
        (3, RES, RES, 3)).astype(np.float32)

    with torch.no_grad():
        g_ref = torch_reference_forward(
            sd, gallery_imgs.transpose(0, 3, 1, 2).copy())
        q_ref = torch_reference_forward(
            sd, query_imgs.transpose(0, 3, 1, 2).copy())
        d_ref = torch.cdist(q_ref, g_ref).numpy()
        order_ref = np.argsort(d_ref, axis=1)

    g = np.asarray(_flax_embed(sd, gallery_imgs), np.float32)
    q = np.asarray(_flax_embed(sd, query_imgs), np.float32)
    from art_sbir_tpu.ops.distance import pairwise_l2

    d = np.asarray(pairwise_l2(jnp.asarray(q), jnp.asarray(g), eps=0.0))
    np.testing.assert_allclose(d, d_ref, rtol=1e-3, atol=1e-3)
    assert (np.argsort(d, axis=1) == order_ref).all()


def test_whole_encoder_classification_heads_parity(rng):
    sd = _tame(_fake_resnet_state_dict(rng, LAYERS, width=WIDTH, out_dim=OUT_DIM))
    sd["classifier.weight"] = rng.standard_normal((5, OUT_DIM)).astype(np.float32)
    sd["classifier.bias"] = rng.standard_normal(5).astype(np.float32)
    sd["classifier2.weight"] = rng.standard_normal((3, OUT_DIM)).astype(np.float32)
    sd["classifier2.bias"] = rng.standard_normal(3).astype(np.float32)
    x = rng.standard_normal((2, RES, RES, 3)).astype(np.float32)

    with torch.no_grad():
        feat = torch_reference_forward(sd, x.transpose(0, 3, 1, 2).copy())
        # reference heads: classes = classifier(feature) (models.py:373-379)
        cls1 = F.linear(feat, _t(sd, "classifier.weight"),
                        _t(sd, "classifier.bias")).numpy()
        cls2 = F.linear(feat, _t(sd, "classifier2.weight"),
                        _t(sd, "classifier2.bias")).numpy()

    model = ModifiedResNetWithClassification(
        layers=LAYERS, output_dim=OUT_DIM, heads=HEADS, input_resolution=RES,
        width=WIDTH, num_classes=5, num_classes2=3,
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, RES, RES, 3)),
                           train=False)
    params, stats = TP.port_modified_resnet_with_classification(
        sd, LAYERS, num_classes=5)
    out = model.apply(
        {"params": TP.merge_into(variables["params"], params),
         "batch_stats": TP.merge_into(variables["batch_stats"], stats)},
        jnp.asarray(x), train=False,
    )
    ours_feat, ours_cls1, ours_cls2 = out
    np.testing.assert_allclose(np.asarray(ours_feat, np.float32),
                               feat.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_cls1, np.float32), cls1,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_cls2, np.float32), cls2,
                               rtol=1e-4, atol=1e-4)
