"""Transformation utilities CLI (reference `transformations.py:62-104`):

* ``dilate``: thicken thin synthetic sketches — 4x4 grayscale dilation +
  binarize at 250, writing ``dilated_<folder>`` next to the input
  (`transformations.py:68-91`), batched on device;
* ``test_transform``: write a few augmented samples of an input sketch to
  disk for visual inspection (`transformations.py:62-66`).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def dilate_folder(folder: Path, batch_size: int = 64) -> Path:
    import jax.numpy as jnp
    from PIL import Image

    from art_sbir_tpu.ops.dilate import dilate_binarize

    paths = sorted(folder.glob("*.png"))
    out_dir = folder.parent / f"dilated_{folder.name}"
    out_dir.mkdir(parents=True, exist_ok=True)
    for s in range(0, len(paths), batch_size):
        chunk = paths[s : s + batch_size]
        imgs = [np.asarray(Image.open(p).convert("L"), np.uint8) for p in chunk]
        for p, img in zip(chunk, imgs):  # sizes may vary -> per image
            out = np.asarray(dilate_binarize(jnp.asarray(img)))
            Image.fromarray(out, mode="L").save(out_dir / p.name)
    print(f"{len(paths)} dilated sketches -> {out_dir}", flush=True)
    return out_dir


def test_transform(image_path: Path, out_dir: Path, n: int = 4,
                   version: int = 1) -> None:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from art_sbir_tpu.ops.augment import sketch_augment

    img = Image.open(image_path).convert("RGB").resize((224, 224), Image.BICUBIC)
    x = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]
    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        aug = sketch_augment(x, jax.random.key(i), version=version,
                             do_normalize=False)
        arr = (np.asarray(aug)[0] * 255).astype(np.uint8)
        Image.fromarray(arr).save(out_dir / f"transformed_{i}.png")
    print(f"{n} augmented samples -> {out_dir}", flush=True)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--method", required=True,
                   choices=["test_transform", "dilate"])
    p.add_argument("-o", "--options", nargs="*", default=[])
    p.add_argument("--out_dir", default="transformations")
    args = p.parse_args(argv)
    if args.method == "dilate":
        dilate_folder(Path(args.options[0]))
    else:
        test_transform(Path(args.options[0]), Path(args.out_dir))


if __name__ == "__main__":
    main()
