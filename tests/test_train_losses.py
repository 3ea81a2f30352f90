"""Loss parity with torch's TripletMarginLoss family."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn

from art_sbir_tpu.ops.distance import cosine_distance
from art_sbir_tpu.train import losses as L


def _tensors(rng, b=8, d=32):
    return [rng.standard_normal((b, d)).astype(np.float32) for _ in range(3)]


def test_triplet_euclidean_matches_torch(rng):
    a, p, n = _tensors(rng)
    ours = float(L.triplet_margin_loss(jnp.array(a), jnp.array(p), jnp.array(n)))
    ref = nn.TripletMarginLoss(margin=0.2)(
        torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n)
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_triplet_cosine_matches_torch(rng):
    a, p, n = _tensors(rng)
    ours = float(
        L.triplet_margin_loss(jnp.array(a), jnp.array(p), jnp.array(n),
                              loss_type="cosine")
    )

    def cos_dist(x, y):
        return 1 - nn.CosineSimilarity(dim=1)(x, y)

    ref = nn.TripletMarginWithDistanceLoss(margin=0.2, distance_function=cos_dist)(
        torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n)
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_classification_variant_matches_torch(rng):
    a, p, n = _tensors(rng)
    num_classes = 7
    cs = rng.standard_normal((8, num_classes)).astype(np.float32)
    cp = rng.standard_normal((8, num_classes)).astype(np.float32)
    labels = rng.integers(0, num_classes, 8)

    cfg = L.TripletLossConfig(
        margin=0.2, classification_weight=0.5, num_heads=1
    )
    ours = L.triplet_loss_with_heads(
        cfg,
        (jnp.array(a), jnp.array(cs)),
        (jnp.array(p), jnp.array(cp)),
        (jnp.array(n), jnp.array(cs)),
        labels=jnp.array(labels),
    )
    tl = nn.TripletMarginWithDistanceLoss(
        margin=0.2, distance_function=nn.PairwiseDistance(p=2)
    )(torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n))
    ce = nn.CrossEntropyLoss()
    ref = tl + 0.5 * (
        ce(torch.from_numpy(cs), torch.from_numpy(labels))
        + ce(torch.from_numpy(cp), torch.from_numpy(labels))
    )
    np.testing.assert_allclose(float(ours["loss"]), ref.item(), rtol=1e-5, atol=1e-5)


def test_two_head_variant(rng):
    a, p, n = _tensors(rng)
    cs = rng.standard_normal((8, 5)).astype(np.float32)
    cs2 = rng.standard_normal((8, 3)).astype(np.float32)
    labels = jnp.array(rng.integers(0, 5, 8))
    labels2 = jnp.array(rng.integers(0, 3, 8))
    cfg = L.TripletLossConfig(classification_weight=0.25,
                              classification_weight2=0.5, num_heads=2)
    out = L.triplet_loss_with_heads(
        cfg,
        (jnp.array(a), jnp.array(cs), jnp.array(cs2)),
        (jnp.array(p), jnp.array(cs), jnp.array(cs2)),
        (jnp.array(n), jnp.array(cs), jnp.array(cs2)),
        labels=labels, labels2=labels2,
    )
    assert np.isfinite(float(out["loss"]))
    assert float(out["loss"]) > float(out["triplet"]) - 1e-6


def test_loss_config_dataset_dispatch():
    """Mirrors reference train.py:164-175."""
    c = L.TripletLossConfig.for_dataset("SketchyV2", "euclidean", True)
    assert c.classification_weight == 0.5 and c.num_heads == 1
    c = L.TripletLossConfig.for_dataset("MixedDatasetV2", "euclidean", True)
    assert c.classification_weight == 0.01
    c = L.TripletLossConfig.for_dataset("KaggleV2", "euclidean", True)
    assert (c.classification_weight, c.classification_weight2) == (0.0, 0.2)
    c = L.TripletLossConfig.for_dataset("KaggleV2", "cosine", True)
    assert (c.classification_weight, c.classification_weight2) == (0.25, 0.5)
    c = L.TripletLossConfig.for_dataset("SketchyV1", "euclidean", False)
    assert c.num_heads == 0
