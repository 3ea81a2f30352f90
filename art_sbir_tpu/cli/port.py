"""Checkpoint-ingestion CLI: reference torch ``.pth`` -> orbax.

Covers every layout of the reference model-loading dispatch (reference
`utils.py:132-206`) and writes the pytree shape each of our CLIs restores:

  ModifiedResNet[_with_classification]  {params, batch_stats}   cli/train --model
  DrawingGenerator                      {params}                cli/drawings --model
  AdaIN (vgg_normalised.pth+decoder.pth){encoder, decoder}      cli/artwork_gen --model
  Photo2Sketch                          {params}                cli/photo2sketch --model
  Pix2Pix (dir with latest_net_G.pth)   {g: {...}, d: {...}}    cli/pix2pix --model
                                        (resnet_9blocks AND unet_256)

Missing keys keep their fresh initialization (torch ``strict=False``
semantics, `utils.py:167,172`); the classifier-resize fallback drops a
mismatched head for re-init (`utils.py:177-197`). The reference never loads
the published PhotoSketch netD (`utils.py:151` is commented out) — we port
netD when present and fall back to fresh init when absent or mismatched.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict


def _to_numpy(sd) -> Dict:
    import numpy as np

    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _load_pth(path: Path) -> Dict:
    import torch

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(loaded, "state_dict"):  # whole-module checkpoints
        loaded = loaded.state_dict()
    return _to_numpy(loaded)


def port_encoder(src: Path, num_classes: int, num_classes2: int,
                 image_size: int = 224):
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.models import torch_port as TP
    from art_sbir_tpu.models.resnet import create_encoder

    sd = _load_pth(src)
    with_cls = any(k.startswith("classifier") for k in sd) and num_classes > 0
    model = create_encoder(
        with_classification=with_cls, num_classes=num_classes,
        num_classes2=num_classes2, input_resolution=image_size,
    )
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.key(0), jnp.zeros((1, image_size, image_size, 3)),
        train=False,
    )
    if with_cls:
        params, stats = TP.port_modified_resnet_with_classification(
            sd, num_classes=num_classes
        )
    else:
        backbone = {k: v for k, v in sd.items() if not k.startswith("classifier")}
        params, stats = TP.port_modified_resnet(backbone)
    return {
        "params": TP.merge_into(variables["params"], params),
        "batch_stats": TP.merge_into(variables["batch_stats"], stats),
    }


def port_drawing(src: Path):
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.models import torch_port as TP
    from art_sbir_tpu.models.drawing import DrawingGenerator

    model = DrawingGenerator()
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 256, 256, 3)))
    ported = TP.port_drawing_generator(_load_pth(src))
    return {"params": TP.merge_into(variables["params"], ported)}


def port_adain(src: Path):
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.models import torch_port as TP
    from art_sbir_tpu.models.adain_net import AdaINDecoder, AdaINEncoder

    src = Path(src)
    if src.is_dir():
        vgg_sd = _load_pth(src / "vgg_normalised.pth")
        dec_sd = _load_pth(src / "decoder.pth")
    else:  # comma-joined pair
        vgg_path, dec_path = str(src).split(",")
        vgg_sd, dec_sd = _load_pth(Path(vgg_path)), _load_pth(Path(dec_path))
    ported = TP.port_adain(vgg_sd, dec_sd)
    enc_vars = jax.jit(AdaINEncoder().init)(jax.random.key(0),
                                            jnp.zeros((1, 64, 64, 3)))
    feat = jnp.zeros((1, 8, 8, 512))
    dec_vars = jax.jit(AdaINDecoder().init)(jax.random.key(1), feat)
    return {
        "encoder": TP.merge_into(enc_vars["params"], ported["encoder"]),
        "decoder": TP.merge_into(dec_vars["params"], ported["decoder"]),
    }


def port_photo2sketch(src: Path, z_size: int = 128, dec_rnn_size: int = 512,
                      num_mixture: int = 20, max_seq_len: int = 100):
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.models import torch_port as TP
    from art_sbir_tpu.models.photo2sketch import Photo2Sketch

    model = Photo2Sketch(z_size=z_size, dec_rnn_size=dec_rnn_size,
                         num_mixture=num_mixture, max_seq_len=max_seq_len)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, max_seq_len, 5)), jax.random.key(1),
    )
    ported = TP.port_photo2sketch(_load_pth(src), hidden=dec_rnn_size)
    return {"params": TP.merge_into(variables["params"], ported)}


def port_pix2pix(src: Path, net_g: str, norm: str = "batch",
                 output_nc: int = 1, ngf: int = 64, ndf: int = 64):
    import jax

    from art_sbir_tpu.models import torch_port as TP
    from art_sbir_tpu.train.gan import Pix2Pix, Pix2PixConfig

    src = Path(src)
    g_path = src / "latest_net_G.pth" if src.is_dir() else src
    cfg = Pix2PixConfig(net_g=net_g, norm=norm, output_nc=output_nc,
                        ngf=ngf, ndf=ndf)
    model = Pix2Pix(cfg, jax.random.key(0))
    g_sd = _load_pth(g_path)
    if net_g == "unet_256":
        g_params, g_stats = TP.port_unet_generator(g_sd)
    else:
        g_params, g_stats = TP.port_resnet_generator(g_sd)
    out = {
        "g": {"params": TP.merge_into(model.g.params, g_params),
              "batch_stats": TP.merge_into(dict(model.g.batch_stats), g_stats)},
        "d": {"params": model.d.params, "batch_stats": model.d.batch_stats},
    }
    d_path = src / "latest_net_D.pth" if src.is_dir() else None
    if d_path is not None and d_path.exists():
        try:
            d_params, d_stats = TP.port_patchgan_discriminator(_load_pth(d_path))
            out["d"] = {
                "params": TP.merge_into(model.d.params, d_params),
                "batch_stats": TP.merge_into(dict(model.d.batch_stats), d_stats),
            }
        except Exception as e:  # reference also skips netD (utils.py:151)
            print(f"netD not ported ({e}); keeping fresh init", flush=True)
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="port a reference torch .pth checkpoint to orbax")
    p.add_argument("--model_type", required=True,
                   choices=["ModifiedResNet", "ModifiedResNet_with_classification",
                            "DrawingGenerator", "AdaIN", "Photo2Sketch",
                            "Pix2Pix"])
    p.add_argument("--src", required=True,
                   help=".pth file, or a dir for Pix2Pix/AdaIN "
                        "(latest_net_G.pth / vgg_normalised.pth+decoder.pth)")
    p.add_argument("--out", required=True, help="orbax output directory")
    p.add_argument("--num_classes", type=int, default=0)
    p.add_argument("--num_classes2", type=int, default=0)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--net_g", default="resnet_9blocks",
                   choices=["resnet_9blocks", "unet_256"])
    p.add_argument("--norm", default="batch", choices=["batch", "instance"])
    p.add_argument("--output_nc", type=int, default=1)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--ndf", type=int, default=64)
    p.add_argument("--z_size", type=int, default=128)
    p.add_argument("--dec_rnn_size", type=int, default=512)
    p.add_argument("--num_mixture", type=int, default=20)
    p.add_argument("--max_seq_len", type=int, default=100)
    return p


def main(argv=None) -> Path:
    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    src = Path(args.src)

    if args.model_type in ("ModifiedResNet", "ModifiedResNet_with_classification"):
        num_classes = args.num_classes
        if args.model_type.endswith("classification") and num_classes == 0:
            num_classes = 125  # reference default head (utils.py:170)
        tree = port_encoder(src, num_classes, args.num_classes2,
                            args.image_size)
    elif args.model_type == "DrawingGenerator":
        tree = port_drawing(src)
    elif args.model_type == "AdaIN":
        tree = port_adain(src)
    elif args.model_type == "Photo2Sketch":
        tree = port_photo2sketch(src, args.z_size, args.dec_rnn_size,
                                 args.num_mixture, args.max_seq_len)
    else:
        tree = port_pix2pix(src, args.net_g, args.norm, args.output_nc,
                            args.ngf, args.ndf)

    from art_sbir_tpu.core.checkpoint import save_pytree

    out = Path(args.out)
    save_pytree(out, tree)
    print(f"Ported {args.model_type} {src} -> {out}", flush=True)
    return out


if __name__ == "__main__":
    main()
