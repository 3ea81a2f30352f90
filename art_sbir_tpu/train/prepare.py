"""Device-side batch finishing: uint8 host batches -> normalized (and
optionally augmented) float batches, one fused XLA program.

The reference does all of this per-sample in DataLoader workers (PIL
transforms, `transformations.py`); here the loader ships uint8 and the
device does /255 + CLIP normalize + (train only) the paired hflip and
sketch augmentation of the Augmented datasets
(`data_preparation.py:644-657`)."""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from art_sbir_tpu.ops.augment import paired_hflip, sketch_augment
from art_sbir_tpu.ops.resize import CLIP_MEAN, CLIP_STD, normalize

_IMAGE_KEYS = ("sketch", "positive", "negative", "A", "B", "image", "photo")


@functools.partial(
    jax.jit, static_argnames=("augment_version", "flip", "train")
)
def finish_triplet_batch(
    batch: Dict,
    key: Optional[jax.Array] = None,
    augment_version: int = 0,
    flip: bool = False,
    train: bool = True,
) -> Dict:
    """uint8 triplet batch -> normalized float32 batch.

    ``augment_version`` > 0 runs sketch_augment V1/V2 on the sketch;
    ``flip`` applies the Augmented datasets' paired horizontal flip.
    """
    out = dict(batch)
    f = {
        k: batch[k].astype(jnp.float32) / 255.0
        for k in ("sketch", "positive", "negative")
        if k in batch
    }
    # per-sample mask: Mixed datasets augment only their Kaggle-sourced
    # samples (reference data_preparation.py:748-753 routing into the
    # Augmented sub-dataset); all-ones when the catalog doesn't mask
    mask = batch.get("augment")
    sel = None
    if mask is not None:
        sel = (mask > 0)[:, None, None, None]

    if train and flip and key is not None:
        kf, key = jax.random.split(key)
        fs, fp, fn = paired_hflip(kf, f["sketch"], f["positive"], f["negative"])
        if sel is not None:
            fs = jnp.where(sel, fs, f["sketch"])
            fp = jnp.where(sel, fp, f["positive"])
            fn = jnp.where(sel, fn, f["negative"])
        f["sketch"], f["positive"], f["negative"] = fs, fp, fn
    if train and augment_version and key is not None:
        ka, key = jax.random.split(key)
        augmented = sketch_augment(
            f["sketch"], ka, version=augment_version, do_normalize=True
        )
        plain = normalize(f["sketch"], CLIP_MEAN, CLIP_STD)
        f["sketch"] = jnp.where(sel, augmented, plain) if sel is not None else augmented
        for k in ("positive", "negative"):
            f[k] = normalize(f[k], CLIP_MEAN, CLIP_STD)
    else:
        for k in f:
            f[k] = normalize(f[k], CLIP_MEAN, CLIP_STD)
    out.update(f)
    return out


@jax.jit
def finish_gallery_batch(images_uint8: jax.Array) -> jax.Array:
    """uint8 (B, S, S, 3) -> CLIP-normalized float; the encoder's fused
    device-side preprocessing for embedding sweeps."""
    return normalize(images_uint8.astype(jnp.float32) / 255.0, CLIP_MEAN, CLIP_STD)
