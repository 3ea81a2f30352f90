"""run_inference engine contract with a fake encoder on synthetic corpora
(covers the gallery cache path and the Kaggle two-pass shape)."""

import numpy as np
import jax.numpy as jnp
import pytest

from art_sbir_tpu.data import get_datasets
from art_sbir_tpu.data.synthetic import make_synthetic_kaggle, make_synthetic_sketchy
from art_sbir_tpu.retrieval.engine import run_inference


def fake_forward(images_uint8):
    """Cheap 'encoder': channel-mean histogram features."""
    x = images_uint8.astype(jnp.float32) / 255.0
    feats = jnp.stack(
        [
            x.mean(axis=(1, 2, 3)),
            x[..., 0].mean(axis=(1, 2)),
            x[..., 1].mean(axis=(1, 2)),
            x[..., 2].mean(axis=(1, 2)),
            x[:, ::2].mean(axis=(1, 2, 3)),
            x[:, :, ::2].mean(axis=(1, 2, 3)),
            x.std(axis=(1, 2, 3)),
            x.max(axis=(1, 2, 3)),
        ],
        axis=1,
    )
    return feats


def test_run_inference_sketchy_schema(tmp_path, rng):
    root = make_synthetic_sketchy(tmp_path / "sketchy")
    _, test = get_datasets("SketchyV1", size=1.0, root=root)
    out = run_inference(
        fake_forward, test, loss_type="euclidean", image_size=32,
        feature_root=tmp_path / "features",
    )
    for key in ("mean_reciprocal_rank", "size", "inference_time", "count",
                "mean", "std", "min", "25%", "50%", "75%", "max", "topk_acc",
                "retrieval_samples", "image_features"):
        assert key in out, key
    assert len(out["topk_acc"]) == 10
    # cache created; second run loads it
    out2 = run_inference(
        fake_forward, test, feature_folder=out["image_features"],
        image_size=32, feature_root=tmp_path / "features",
    )
    np.testing.assert_allclose(out2["mean_reciprocal_rank"],
                               out["mean_reciprocal_rank"], rtol=1e-6)


def test_run_inference_kaggle_two_pass(tmp_path, rng):
    root = make_synthetic_kaggle(tmp_path / "kaggle")
    _, test = get_datasets("KaggleV1", size=1.0, root=root, img_type="images",
                           sketch_type="contour_drawings")
    _, kq = get_datasets("KaggleInferenceV1", sketch_type="sketches", root=root)
    out = run_inference(
        fake_forward, test, image_size=32, feature_root=tmp_path / "features",
        kaggle_queries=kq,
    )
    assert set(out) == {"image_features", "drawing_stats", "sketch_stats"}
    assert out["drawing_stats"]["size"] == out["sketch_stats"]["size"]
