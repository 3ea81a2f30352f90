"""Device-side batch finishing (train/prepare.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from art_sbir_tpu.ops.resize import CLIP_MEAN, CLIP_STD
from art_sbir_tpu.train.prepare import finish_gallery_batch, finish_triplet_batch


def _uint8_batch(rng, b=4, s=32):
    return {
        k: jnp.asarray(rng.integers(0, 256, (b, s, s, 3)), jnp.uint8)
        for k in ("sketch", "positive", "negative")
    }


def test_finish_normalizes(rng):
    batch = _uint8_batch(rng)
    out = finish_triplet_batch(batch, train=False)
    ref = (np.asarray(batch["sketch"], np.float32) / 255.0
           - np.array(CLIP_MEAN, np.float32)) / np.array(CLIP_STD, np.float32)
    np.testing.assert_allclose(np.asarray(out["sketch"]), ref, rtol=1e-4,
                               atol=1e-5)


def test_finish_keeps_labels(rng):
    batch = _uint8_batch(rng)
    batch["label"] = jnp.asarray([0, 1, 2, 0], jnp.int32)
    out = finish_triplet_batch(batch, train=False)
    np.testing.assert_array_equal(np.asarray(out["label"]), [0, 1, 2, 0])


def test_finish_augments_sketch_only(rng):
    batch = _uint8_batch(rng)
    key = jax.random.key(0)
    out = finish_triplet_batch(batch, key, augment_version=1, flip=False,
                               train=True)
    base = finish_triplet_batch(batch, train=False)
    # positives unchanged by augmentation (beyond normalize)
    np.testing.assert_allclose(np.asarray(out["positive"]),
                               np.asarray(base["positive"]), rtol=1e-5)
    # deterministic per key
    out2 = finish_triplet_batch(batch, key, augment_version=1, flip=False,
                                train=True)
    np.testing.assert_array_equal(np.asarray(out["sketch"]),
                                  np.asarray(out2["sketch"]))


def test_finish_gallery(rng):
    x = jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3)), jnp.uint8)
    out = np.asarray(finish_gallery_batch(x))
    assert out.dtype == np.float32
    assert np.isfinite(out).all()


def test_finish_respects_augment_mask(rng):
    batch = _uint8_batch(rng)
    batch["augment"] = jnp.asarray([1, 0, 1, 0], jnp.int32)
    key = jax.random.key(7)
    out = finish_triplet_batch(batch, key, augment_version=1, flip=True,
                               train=True)
    base = finish_triplet_batch(batch, train=False)
    out_s, base_s = np.asarray(out["sketch"]), np.asarray(base["sketch"])
    # masked-off samples match the plain normalize path (different compiled
    # programs -> fp-fusion tolerance); masked-on samples are transformed
    np.testing.assert_allclose(out_s[1], base_s[1], atol=1e-5)
    np.testing.assert_allclose(out_s[3], base_s[3], atol=1e-5)
    assert not np.allclose(out_s[0], base_s[0], atol=1e-3)


def test_mixed_catalog_augment_mask(tmp_path, rng):
    from art_sbir_tpu.data import get_datasets
    from art_sbir_tpu.data.synthetic import (
        make_synthetic_kaggle,
        make_synthetic_sketchy,
    )

    kroot = make_synthetic_kaggle(tmp_path / "kaggle")
    sroot = make_synthetic_sketchy(tmp_path / "sketchy")
    train, _ = get_datasets(
        "MixedDatasetV1", size=1.0, root_kaggle=kroot, root_sketchy=sroot,
        sketch_type="contour_drawings",
    )
    assert train.augment_sketches == 1
    assert train.item(0)["augment"] == 1  # even -> kaggle (augmented)
    assert train.item(1)["augment"] == 0  # odd -> sketchy (plain)
