"""Torch-checkpoint porting: reference ``.pth`` state dicts -> flax trees.

Covers the reference model-loading dispatch (reference `utils.py:132-206`):
ModifiedResNet(+classification) CLIP RN50 layouts, DrawingGenerator, and the
classifier-resize fallback (try the target head size; on mismatch load the
125-class checkpoint and re-initialize the head, `utils.py:177-197`).

Layout transforms: torch Conv2d (O, I, kh, kw) -> flax (kh, kw, I, O);
Linear (out, in) -> Dense kernel (in, out); BatchNorm weight/bias/
running_mean/running_var -> scale/bias + batch_stats mean/var. Tensors
arrive as numpy arrays (load ``.pth`` with ``torch.load(map_location='cpu')``
and convert) so this module itself has no torch dependency.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) -> our ConvTranspose
    param layout (kh, kw, out, in)."""
    return np.transpose(w, (2, 3, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _conv(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    out = {"kernel": conv_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _dense(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    out = {"kernel": dense_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _bottleneck(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params: Dict = {}
    stats: Dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv(sd, f"{prefix}.conv{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"{prefix}.bn{i}")
    if f"{prefix}.downsample.0.weight" in sd:
        params["downsample_conv"] = _conv(sd, f"{prefix}.downsample.0")
        params["downsample_bn"], stats["downsample_bn"] = _bn(
            sd, f"{prefix}.downsample.1"
        )
    return params, stats


def port_modified_resnet(
    sd: Dict[str, np.ndarray], layers=(3, 4, 6, 3)
) -> Tuple[Dict, Dict]:
    """Reference ModifiedResNet state dict -> (params, batch_stats) matching
    :class:`art_sbir_tpu.models.resnet.ModifiedResNet` names."""
    params: Dict = {}
    stats: Dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv(sd, f"conv{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"bn{i}")
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            p, s = _bottleneck(sd, f"layer{stage}.{b}")
            params[f"layer{stage}_{b}"] = p
            stats[f"layer{stage}_{b}"] = s
    attn = {
        "positional_embedding": sd["attnpool.positional_embedding"],
        "q_proj": _dense(sd, "attnpool.q_proj"),
        "k_proj": _dense(sd, "attnpool.k_proj"),
        "v_proj": _dense(sd, "attnpool.v_proj"),
        "c_proj": _dense(sd, "attnpool.c_proj"),
    }
    params["attnpool"] = attn
    return params, stats


def port_modified_resnet_with_classification(
    sd: Dict[str, np.ndarray],
    layers=(3, 4, 6, 3),
    num_classes: int | None = None,
) -> Tuple[Dict, Dict]:
    """Adds classifier head(s); replicates the classifier-resize fallback
    (reference `utils.py:177-197`): when the checkpoint head size differs
    from ``num_classes``, the head is dropped for re-initialization."""
    backbone_sd = {k: v for k, v in sd.items() if not k.startswith("classifier")}
    bp, bs = port_modified_resnet(backbone_sd, layers)
    params: Dict = {"backbone": bp}
    stats: Dict = {"backbone": bs}
    if "classifier.weight" in sd:
        head = _dense(sd, "classifier")
        if num_classes is None or head["kernel"].shape[1] == num_classes:
            params["classifier"] = head
    if "classifier2.weight" in sd:
        params["classifier2"] = _dense(sd, "classifier2")
    return params, stats


def port_drawing_generator(sd: Dict[str, np.ndarray],
                           n_residual_blocks: int = 3) -> Dict:
    """Reference DrawingGenerator layout (model0..model4 Sequentials,
    `drawing_utils/model.py:31-86`) -> our named modules."""
    params: Dict = {}
    params["stem"] = _conv(sd, "model0.1")
    for i in range(2):
        params[f"down{i}"] = _conv(sd, f"model1.{i * 3}")
    for i in range(n_residual_blocks):
        params[f"res{i}"] = {
            "Conv_0": _conv(sd, f"model2.{i}.conv_block.1"),
            "Conv_1": _conv(sd, f"model2.{i}.conv_block.5"),
        }
    for i in range(2):
        w = sd[f"model3.{i * 3}.weight"]
        params[f"up{i}"] = {
            "kernel": conv_transpose_kernel(w),
            "bias": sd[f"model3.{i * 3}.bias"],
        }
    params["head"] = _conv(sd, "model4.1")
    return params


def port_vgg16_features(sd: Dict[str, np.ndarray],
                        prefix: str = "feature") -> Dict:
    """torchvision vgg16 `features` Sequential -> our VGGFeatures names.

    torch indices of the conv layers in cfg 'D': 0,2,5,7,10,12,14,17,19,21,
    24,26,28 — mapped to conv0..conv12 (reference Photo2Sketch encoder
    backbone, `models.py:38`)."""
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out: Dict = {}
    for i, t in enumerate(conv_idx):
        out[f"conv{i}"] = _conv(sd, f"{prefix}.{t}")
    return out


def port_adain(vgg_sd: Dict[str, np.ndarray],
               decoder_sd: Dict[str, np.ndarray]) -> Dict:
    """The published AdaIN checkpoints (vgg_normalised.pth + decoder.pth,
    reference `utils.py:153-160`) -> our AdaINEncoder/AdaINDecoder names.

    Encoder Sequential conv indices (reference net.py vgg): 0 is the 1x1
    color projection, then 3x3 convs at 2,5, 9,12, 16,19,22,25, 29 (through
    relu4_1; deeper layers unused by style transfer are ignored).
    Decoder conv indices: 1,5,8,11,14, 18,21, 25,28.
    """
    enc: Dict = {"proj": _conv(vgg_sd, "0")}
    for i, t in enumerate([2, 5, 9, 12, 16, 19, 22, 25, 29]):
        if f"{t}.weight" in vgg_sd:
            enc[f"conv{i}"] = _conv(vgg_sd, str(t))
    dec: Dict = {}
    dec_idx = [1, 5, 8, 11, 14, 18, 21, 25]
    for i, t in enumerate(dec_idx):
        dec[f"conv{i}"] = _conv(decoder_sd, str(t))
    dec["out"] = _conv(decoder_sd, "28")
    return {"encoder": enc, "decoder": dec}


def port_resnet_generator(
    sd: Dict[str, np.ndarray], n_blocks: int = 9
) -> Tuple[Dict, Dict]:
    """pix2pix ResnetGenerator state dict (`model.*` Sequential, reference
    `pix2pix_model.py:607-658`) -> (params, batch_stats) for our named flax
    modules. BatchNorm checkpoints port their norm params/stats; instance-
    norm checkpoints carry no norm tensors (our instance norm is
    parameter-free, matching torch defaults)."""
    params: Dict = {}
    stats: Dict = {}

    def norm(dst_p: Dict, dst_s: Dict, key: str, prefix: str):
        if f"{prefix}.running_mean" in sd:
            p, s = _bn(sd, prefix)
            dst_p[key] = {"BatchNorm_0": p}
            dst_s[key] = {"BatchNorm_0": s}

    params["Conv_0"] = _conv(sd, "model.1")
    norm(params, stats, "Norm_0", "model.2")
    params["Conv_1"] = _conv(sd, "model.4")
    norm(params, stats, "Norm_1", "model.5")
    params["Conv_2"] = _conv(sd, "model.7")
    norm(params, stats, "Norm_2", "model.8")
    for b in range(n_blocks):
        base = f"model.{10 + b}.conv_block"
        blk_p: Dict = {"Conv_0": _conv(sd, f"{base}.1"),
                       "Conv_1": _conv(sd, f"{base}.6")}
        blk_s: Dict = {}
        norm(blk_p, blk_s, "Norm_0", f"{base}.2")
        norm(blk_p, blk_s, "Norm_1", f"{base}.7")
        params[f"ResnetBlock_{b}"] = blk_p
        if blk_s:
            stats[f"ResnetBlock_{b}"] = blk_s
    up0 = 10 + n_blocks
    for i, t in enumerate([up0, up0 + 3]):
        w = sd[f"model.{t}.weight"]
        ct = {"kernel": conv_transpose_kernel(w)}
        if f"model.{t}.bias" in sd:
            ct["bias"] = sd[f"model.{t}.bias"]
        params[f"ConvTranspose_{i}"] = ct
        norm(params, stats, f"Norm_{3 + i}", f"model.{t + 1}")
    params["Conv_3"] = _conv(sd, f"model.{up0 + 7}")
    return params, stats


def port_unet_generator(
    sd: Dict[str, np.ndarray], num_downs: int = 8
) -> Tuple[Dict, Dict]:
    """pix2pix UnetGenerator state dict -> (params, batch_stats).

    The reference builds the U-Net recursively from the innermost block out
    (`pix2pix_model.py:701-800`), so torch keys nest as
    ``model.model.<i>.model.<i>...``; per-level Sequential indices are

      outermost: 0 downconv | 1 submodule | 3 upconv
      middle:    1 downconv | 2 downnorm | 3 submodule | 5 upconv | 6 upnorm
      innermost: 1 downconv | 3 upconv | 4 upnorm

    Our flax blocks are flat siblings named ``UnetSkipBlock_{k}`` with k=0
    the innermost; Norm_0/Norm_1 = (downnorm, upnorm) for middle blocks and
    Norm_0 = upnorm for the innermost. InstanceNorm checkpoints carry no
    norm tensors (parameter-free on both sides)."""
    params: Dict = {}
    stats: Dict = {}
    prefix = "model.model"
    for level in range(num_downs):  # 0 = outermost
        name = f"UnetSkipBlock_{num_downs - 1 - level}"
        outermost = level == 0
        innermost = level == num_downs - 1
        if outermost:
            down, up, norms, sub = 0, 3, [], 1
        elif innermost:
            down, up, norms, sub = 1, 3, [4], None
        else:
            down, up, norms, sub = 1, 5, [2, 6], 3

        p: Dict = {"Conv_0": _conv(sd, f"{prefix}.{down}")}
        ct: Dict = {"kernel": conv_transpose_kernel(sd[f"{prefix}.{up}.weight"])}
        if f"{prefix}.{up}.bias" in sd:
            ct["bias"] = sd[f"{prefix}.{up}.bias"]
        p["ConvTranspose_0"] = ct
        s: Dict = {}
        for j, t in enumerate(norms):
            if f"{prefix}.{t}.running_mean" in sd:  # batch norm only
                np_, ns_ = _bn(sd, f"{prefix}.{t}")
                p[f"Norm_{j}"] = {"BatchNorm_0": np_}
                s[f"Norm_{j}"] = {"BatchNorm_0": ns_}
        params[name] = p
        if s:
            stats[name] = s
        if sub is not None:
            prefix = f"{prefix}.{sub}.model"
    return params, stats


def port_patchgan_discriminator(
    sd: Dict[str, np.ndarray], n_layers: int = 3
) -> Tuple[Dict, Dict]:
    """NLayerDiscriminator ``model.N`` Sequential (reference
    `pix2pix_model.py:803-859`) -> our named modules.

    Layout: conv(0) leaky(1), then per middle layer conv+norm+leaky
    triples, then a stride-1 conv+norm+leaky, then the 1-channel output
    conv. For n_layers=3: convs at 0,2,5,8,11; batch norms at 3,6,9."""
    params: Dict = {}
    stats: Dict = {}
    conv_idx = [0]
    norm_idx = []
    t = 2
    for _ in range(n_layers):  # middle layers + the stride-1 layer
        conv_idx.append(t)
        norm_idx.append(t + 1)
        t += 3
    conv_idx.append(t)
    for i, ci in enumerate(conv_idx):
        params[f"Conv_{i}"] = _conv(sd, f"model.{ci}")
    for j, ni in enumerate(norm_idx):
        if f"model.{ni}.running_mean" in sd:
            p, s = _bn(sd, f"model.{ni}")
            params[f"Norm_{j}"] = {"BatchNorm_0": p}
            stats[f"Norm_{j}"] = {"BatchNorm_0": s}
    return params, stats


def port_photo2sketch(sd: Dict[str, np.ndarray], hidden: int = 512) -> Dict:
    """Reference Photo2Sketch state dict (`models.py:16-181`;
    `utils.py:173-176` dispatch) -> our flax tree.

    Our TorchLSTMCell stores ``kernel``/``bias`` such that the effective
    weight is ``kernel - k`` with ``k = 1/sqrt(hidden)`` (uniform-init
    shifting); torch tensors are offset accordingly. torch nn.LSTM layer-0
    weights are (4H, in) — transposed into (in, 4H).
    """
    k = np.float32(1.0 / np.sqrt(hidden))
    enc = {
        "feature": port_vgg16_features(sd, prefix="Image_Encoder.feature"),
        "fc_mu": _dense(sd, "Image_Encoder.fc_mu"),
        "fc_std": _dense(sd, "Image_Encoder.fc_std"),
    }
    dec = {
        "fc_hc": _dense(sd, "Sketch_Decoder.fc_hc"),
        "fc_params": _dense(sd, "Sketch_Decoder.fc_params"),
        "lstm": {
            "ih_kernel": sd["Sketch_Decoder.lstm.weight_ih_l0"].T + k,
            "ih_bias": sd["Sketch_Decoder.lstm.bias_ih_l0"] + k,
            "hh_kernel": sd["Sketch_Decoder.lstm.weight_hh_l0"].T + k,
            "hh_bias": sd["Sketch_Decoder.lstm.bias_hh_l0"] + k,
        },
        "attention_cell": {
            "conv_h": _dense(sd, "Sketch_Decoder.attention_cell.conv_h"),
            "conv_f": _conv(sd, "Sketch_Decoder.attention_cell.conv_f"),
            "conv_att": _dense(sd, "Sketch_Decoder.attention_cell.conv_att"),
        },
    }
    return {"Image_Encoder": enc, "Sketch_Decoder": dec}


def merge_into(variables_params: Dict, ported: Dict) -> Dict:
    """Recursively overlay ported arrays onto an initialized param tree
    (strict=False semantics: missing ported keys keep their init)."""
    out = dict(variables_params)
    for k, v in ported.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_into(out[k], v)
        else:
            out[k] = np.asarray(v)
    return out
