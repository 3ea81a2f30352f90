"""Weight-porting layout transforms verified against torch primitives, and
the key-mapping on synthesized reference-layout state dicts."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from art_sbir_tpu.models import torch_port as TP
from art_sbir_tpu.models.resnet import ModifiedResNet


def test_conv_kernel_layout(rng):
    x = rng.standard_normal((1, 9, 9, 4)).astype(np.float32)
    w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)  # torch OIHW
    ref = tnn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2).copy()), torch.from_numpy(w),
        padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    ours = jax.lax.conv_general_dilated(
        jnp.array(x), jnp.array(TP.conv_kernel(w)), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_dense_kernel_layout(rng):
    x = rng.standard_normal((5, 8)).astype(np.float32)
    w = rng.standard_normal((3, 8)).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)
    ref = (torch.from_numpy(x) @ torch.from_numpy(w).T + torch.from_numpy(b)).numpy()
    ours = x @ TP.dense_kernel(w) + b
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def _fake_resnet_state_dict(rng, layers=(1, 1, 1, 1), width=8, out_dim=32):
    """Reference-layout state dict with random weights and correct shapes."""
    sd = {}

    def conv(prefix, i, o, k):
        sd[f"{prefix}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.random(c).astype(np.float32) + 0.5

    conv("conv1", 3, width // 2, 3); bn("bn1", width // 2)
    conv("conv2", width // 2, width // 2, 3); bn("bn2", width // 2)
    conv("conv3", width // 2, width, 3); bn("bn3", width)

    inplanes = width
    for stage, blocks in enumerate(layers, start=1):
        planes = width * (2 ** (stage - 1))
        for b in range(blocks):
            p = f"layer{stage}.{b}"
            conv(f"{p}.conv1", inplanes, planes, 1); bn(f"{p}.bn1", planes)
            conv(f"{p}.conv2", planes, planes, 3); bn(f"{p}.bn2", planes)
            conv(f"{p}.conv3", planes, planes * 4, 1); bn(f"{p}.bn3", planes * 4)
            if stage > 1 and b == 0 or inplanes != planes * 4:
                conv(f"{p}.downsample.0", inplanes, planes * 4, 1)
                bn(f"{p}.downsample.1", planes * 4)
            inplanes = planes * 4

    embed = width * 32
    sd["attnpool.positional_embedding"] = rng.standard_normal(
        (2 * 2 + 1, embed)
    ).astype(np.float32)
    for name, (o, i) in [("q_proj", (embed, embed)), ("k_proj", (embed, embed)),
                         ("v_proj", (embed, embed)), ("c_proj", (out_dim, embed))]:
        sd[f"attnpool.{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        sd[f"attnpool.{name}.bias"] = rng.standard_normal(o).astype(np.float32)
    return sd


def test_port_modified_resnet_full_tree(rng):
    layers = (1, 1, 1, 1)
    model = ModifiedResNet(layers=layers, output_dim=32, heads=4,
                           input_resolution=64, width=8)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)

    sd = _fake_resnet_state_dict(rng, layers)
    params, stats = TP.port_modified_resnet(sd, layers)
    merged_p = TP.merge_into(variables["params"], params)
    merged_s = TP.merge_into(variables["batch_stats"], stats)

    # every initialized leaf must be overwritten with matching shape
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
    new_shapes = jax.tree_util.tree_map(lambda a: a.shape, merged_p)
    assert ref_shapes == new_shapes
    out = model.apply({"params": merged_p, "batch_stats": merged_s}, x, train=False)
    assert np.isfinite(np.asarray(out)).all()
    # and it actually changed the params
    a0 = jax.tree_util.tree_leaves(variables["params"])[0]
    b0 = jax.tree_util.tree_leaves(merged_p)[0]
    assert not np.allclose(np.asarray(a0), np.asarray(b0))


def test_classifier_resize_fallback(rng):
    sd = _fake_resnet_state_dict(rng)
    sd["classifier.weight"] = rng.standard_normal((125, 32)).astype(np.float32)
    sd["classifier.bias"] = rng.standard_normal(125).astype(np.float32)
    params, _ = TP.port_modified_resnet_with_classification(
        sd, (1, 1, 1, 1), num_classes=70
    )
    assert "classifier" not in params  # dropped -> fresh head (utils.py:186)
    params2, _ = TP.port_modified_resnet_with_classification(
        sd, (1, 1, 1, 1), num_classes=125
    )
    assert params2["classifier"]["kernel"].shape == (32, 125)
