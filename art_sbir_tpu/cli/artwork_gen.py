"""AdaIN style-transfer CLI (reference `artwork_gen.py`).

For each content photo, picks a random style image and writes
``style_transfer(content, style, alpha)`` results — the reference's
synthetic 'artworks'/'adain_sketches' generators (`artwork_gen.py:95-115`
and the commented sketchy block at `:62-89`). Batched on device.
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from art_sbir_tpu.core.checkpoint import load_pytree
    from art_sbir_tpu.data.loader import decode_image
    from art_sbir_tpu.models.adain_net import AdaINDecoder, AdaINEncoder, style_transfer

    p = argparse.ArgumentParser(description="AdaIN style transfer")
    p.add_argument("--content_dir", required=True)
    p.add_argument("--style_dir", required=True)
    p.add_argument("--out_dir", default="data/kaggle/adain_sketches")
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--model", type=str, default=None,
                   help="orbax checkpoint with encoder/decoder params, OR a "
                        "dir holding the published vgg_normalised.pth + "
                        "decoder.pth (reference utils.py:153-160)")
    p.add_argument("-b", "--batch_size", type=int, default=8)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args(argv)

    enc = AdaINEncoder()
    dec = AdaINDecoder()
    s = args.image_size
    x0 = jnp.zeros((1, s, s, 3))
    enc_vars = enc.init(jax.random.key(0), x0)
    dec_vars = dec.init(jax.random.key(1), enc.apply(enc_vars, x0))
    if args.model:
        from pathlib import Path as _P

        if (_P(args.model) / "vgg_normalised.pth").exists() or \
                args.model.endswith(".pth"):
            from art_sbir_tpu.cli.port import port_adain

            restored = port_adain(_P(args.model))
        else:
            restored = load_pytree(args.model, {"encoder": enc_vars["params"],
                                                "decoder": dec_vars["params"]})
        enc_vars = {"params": restored["encoder"]}
        dec_vars = {"params": restored["decoder"]}

    transfer = jax.jit(
        lambda c, st: style_transfer(
            lambda x: enc.apply(enc_vars, x),
            lambda t: dec.apply(dec_vars, t),
            c, st, args.alpha,
        )
    )

    exts = ("*.jpg", "*.jpeg", "*.png")
    content_paths = sorted(
        q for e in exts for q in Path(args.content_dir).rglob(e)
    )
    style_paths = sorted(q for e in exts for q in Path(args.style_dir).rglob(e))
    if args.limit:
        content_paths = content_paths[: args.limit]
    if not content_paths or not style_paths:
        raise FileNotFoundError("no content or style images found")

    rng = random.Random(args.seed)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    for i in range(0, len(content_paths), args.batch_size):
        chunk = content_paths[i : i + args.batch_size]
        content = np.stack([decode_image(q, s) for q in chunk]) / 255.0
        styles = np.stack(
            [decode_image(rng.choice(style_paths), s) for _ in chunk]
        ) / 255.0
        out = np.asarray(transfer(jnp.asarray(content, jnp.float32),
                                  jnp.asarray(styles, jnp.float32)))
        out = (np.clip(out, 0, 1) * 255).astype(np.uint8)
        for img, path in zip(out, chunk):
            Image.fromarray(img).save(out_dir / f"{path.stem}.jpg")
    print(f"{len(content_paths)} stylized images written to {out_dir}", flush=True)


if __name__ == "__main__":
    main()
