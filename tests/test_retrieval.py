"""Retrieval engine vs a hand-computed tiny gallery and a straightforward
numpy re-derivation of the reference metric loop."""

import numpy as np
import jax

from art_sbir_tpu.retrieval import embed as E
from art_sbir_tpu.retrieval import rank as R


def test_positive_index_rules():
    image_paths = ["g/n123_45.jpg", "g/n200_1.jpg", "g/77.jpg"]
    sketch_paths = [
        "s/n123_45-2.png",  # sketchy: id-number -> n123_45
        "s/77.png",  # kaggle: id
        "s/0-n200_1-939.png",  # sketchit: idx-id-random -> n200_1
        "s/none-here.png",  # missing -> -1
    ]
    pos = R.positive_indices(sketch_paths, image_paths)
    assert list(pos) == [0, 2, 1, -1]


def test_positive_index_artworks_rule():
    image_paths = ["artworks/n123_45-2.jpg"]
    pos = R.positive_indices(["s/n123_45-2.png"], image_paths)
    assert list(pos) == [0]


def test_evaluate_retrieval_tiny(rng):
    # 4 gallery images; queries are noisy copies -> known ranks
    d = 16
    gal = rng.standard_normal((4, d)).astype(np.float32) * 5
    image_paths = [f"g/img{i}.jpg" for i in range(4)]
    sketch_paths = [f"s/img{i}-1.png" for i in range(4)]
    queries = gal + 0.01

    stats = R.evaluate_retrieval(queries, gal, sketch_paths, image_paths, k=4)
    assert stats["mean_reciprocal_rank"] == 1.0
    assert stats["topk_acc"][0] == 1.0
    assert stats["size"] == 4
    assert stats["count"] == 4.0
    assert stats["mean"] == 1.0  # all ranks are 1 (1-based)
    assert len(stats["retrieval_samples"]) >= 1
    # sample entries: (path, distance) with top1 = own image
    sample = stats["retrieval_samples"][0]
    (spath, entries), = sample.items()
    idx = int(spath.split("img")[1].split("-")[0])
    assert entries[0][0] == f"g/img{idx}.jpg"


def test_evaluate_retrieval_matches_numpy_loop(rng):
    d, n, q = 8, 25, 12
    gal = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    image_paths = [f"g/{i}.jpg" for i in range(n)]
    sketch_paths = [f"s/{i % n}-1.png" for i in range(q)]

    stats = R.evaluate_retrieval(queries, gal, sketch_paths, image_paths, k=10)

    # straightforward reference-loop re-derivation
    ranks = []
    for i in range(q):
        dist = np.sqrt(((queries[i] - gal + 1e-6) ** 2).sum(-1))
        order = np.argsort(dist, kind="stable")
        ranks.append(int(np.nonzero(order == (i % n))[0][0]) + 1)
    ranks = np.array(ranks)
    np.testing.assert_allclose(
        stats["mean_reciprocal_rank"], (1.0 / ranks).mean(), rtol=1e-6
    )
    np.testing.assert_allclose(stats["mean"], ranks.mean(), rtol=1e-6)
    for j in range(10):
        np.testing.assert_allclose(stats["topk_acc"][j], (ranks <= j + 1).mean())


def test_missing_positive_gets_gallery_size_rank(rng):
    gal = rng.standard_normal((5, 4)).astype(np.float32)
    stats = R.evaluate_retrieval(
        gal[:1], gal, ["s/unknown.png"], [f"g/{i}.jpg" for i in range(5)], k=5
    )
    assert stats["max"] == 6.0  # rank N + 1-based


def test_embed_batched_pads_tail(rng):
    # fake encoder: mean over pixels -> feature
    def apply_fn(x):
        return x.mean(axis=(1, 2))

    imgs = rng.standard_normal((10, 8, 8, 3)).astype(np.float32)
    feats = E.embed_batched(apply_fn, imgs, batch_size=4)
    assert feats.shape == (10, 3)
    np.testing.assert_allclose(feats, imgs.mean(axis=(1, 2)), rtol=2e-4)


def test_feature_cache_roundtrip(tmp_path, rng):
    feats = rng.standard_normal((6, 4)).astype(np.float32)
    paths = [f"img{i}.jpg" for i in range(6)]
    name = E.save_image_features("M", "D", paths, feats, root=tmp_path)
    lp, lf = E.load_image_features(name, root=tmp_path)
    assert [str(p) for p in lp] == paths
    np.testing.assert_array_equal(lf, feats)


def test_feature_cache_reads_reference_csv(tmp_path, rng):
    """Interop with caches produced by the reference (CSV floats)."""
    import csv

    folder = tmp_path / "legacy"
    folder.mkdir()
    feats = rng.standard_normal((3, 4))
    with open(folder / "image_paths.csv", "w") as f:
        csv.writer(f).writerows([[f"p{i}.jpg"] for i in range(3)])
    with open(folder / "image_features.csv", "w") as f:
        csv.writer(f).writerows(feats)
    lp, lf = E.load_image_features("legacy", root=tmp_path)
    np.testing.assert_allclose(lf, feats, rtol=1e-12)


def test_retrieval_samples_seed_matches_reference_rng(rng):
    """The 10 sample indices come from stdlib random seeded with 11 —
    exactly the reference's sequence (inference.py:101-102)."""
    import random

    d, n = 8, 40
    gal = rng.standard_normal((n, d)).astype(np.float32)
    sketch_paths = [f"s/{i}-1.png" for i in range(n)]
    image_paths = [f"g/{i}.jpg" for i in range(n)]
    stats = R.evaluate_retrieval(gal, gal, sketch_paths, image_paths, k=5)

    random.seed(11)
    expected = sorted({random.randrange(0, n) for _ in range(10)})
    got = sorted(
        int(list(s.keys())[0].split("/")[1].split("-")[0])
        for s in stats["retrieval_samples"]
    )
    assert got == expected


def test_evaluate_retrieval_fused_routing_matches_xla(rng, monkeypatch):
    """Past FUSED_GALLERY_THRESHOLD the eval routes through the fused
    Pallas kernel; with the threshold monkeypatched down (and the kernel
    interpret-lowered — the CPU test backend has no Mosaic compiler) the
    inference dict must match the XLA path: identical ranks/metrics/sample
    ordering, distances to float rounding."""
    d = 32
    gal = rng.standard_normal((300, d)).astype(np.float32)
    image_paths = [f"g/img{i}.jpg" for i in range(300)]
    sketch_paths = [f"s/img{i}-1.png" for i in range(40)]
    queries = gal[:40] + 0.05 * rng.standard_normal((40, d)).astype(np.float32)

    ref = R.evaluate_retrieval(queries, gal, sketch_paths, image_paths, k=10)

    import art_sbir_tpu.ops.retrieval_pallas as RP

    orig = RP.retrieve_fused

    def fused_interpret(*args, **kw):
        kw["interpret"] = True  # CPU test backend has no Mosaic compiler
        return orig(*args, **kw)

    monkeypatch.setattr(RP, "retrieve_fused", fused_interpret)
    monkeypatch.setattr(R, "FUSED_GALLERY_THRESHOLD", 100)
    got = R.evaluate_retrieval(queries, gal, sketch_paths, image_paths, k=10)

    assert got["mean_reciprocal_rank"] == ref["mean_reciprocal_rank"]
    assert got["topk_acc"] == ref["topk_acc"]
    assert got["mean"] == ref["mean"]
    # sample ordering/paths identical; distances agree to float rounding
    # (the kernel reports squared values, sqrt'd for the schema)
    for gs, rs in zip(got["retrieval_samples"], ref["retrieval_samples"]):
        (gk, gv), (rk, rv) = next(iter(gs.items())), next(iter(rs.items()))
        assert gk == rk
        assert [p for p, _ in gv] == [p for p, _ in rv]
        np.testing.assert_allclose([x for _, x in gv], [x for _, x in rv],
                                   rtol=2e-4)


def test_evaluate_retrieval_sharded_fused_matches_xla(rng, monkeypatch):
    """With a mesh whose device count divides the gallery, the fused
    routing shards the gallery across devices; metrics must still match
    the plain XLA evaluation exactly."""
    from art_sbir_tpu.parallel.mesh import MeshSpec

    d = 32
    gal = rng.standard_normal((512, d)).astype(np.float32)
    image_paths = [f"g/img{i}.jpg" for i in range(512)]
    sketch_paths = [f"s/img{i}-1.png" for i in range(40)]
    queries = gal[:40] + 0.05 * rng.standard_normal((40, d)).astype(np.float32)

    ref = R.evaluate_retrieval(queries, gal, sketch_paths, image_paths, k=10)
    monkeypatch.setattr(R, "FUSED_GALLERY_THRESHOLD", 100)
    mesh = MeshSpec(data=len(jax.devices())).build()
    got = R.evaluate_retrieval(queries, gal, sketch_paths, image_paths,
                               k=10, mesh=mesh)
    assert got["mean_reciprocal_rank"] == ref["mean_reciprocal_rank"]
    assert got["topk_acc"] == ref["topk_acc"]
    assert got["mean"] == ref["mean"]


def test_evaluate_retrieval_chunking_invariant(rng):
    """The device-side result accumulation must make query_chunk purely a
    memory knob: chunked and single-shot sweeps agree exactly."""
    d, n, q = 8, 30, 11
    gal = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    image_paths = [f"g/{i}.jpg" for i in range(n)]
    sketch_paths = [f"s/{i % n}-1.png" for i in range(q)]

    one = R.evaluate_retrieval(queries, gal, sketch_paths, image_paths, k=5,
                               query_chunk=1024)
    many = R.evaluate_retrieval(queries, gal, sketch_paths, image_paths, k=5,
                                query_chunk=3)  # 4 ragged chunks
    for key in ("mean_reciprocal_rank", "mean", "count"):
        np.testing.assert_allclose(one[key], many[key])
    np.testing.assert_allclose(one["topk_acc"], many["topk_acc"])
    assert one["retrieval_samples"] == many["retrieval_samples"]


def test_embed_batched_return_device_matches_host(rng):
    import jax.numpy as jnp

    imgs = rng.standard_normal((10, 4, 4, 1)).astype(np.float32)
    f = lambda x: jnp.mean(x, axis=(1, 2))  # (B, 1) embedding
    host = E.embed_batched(f, imgs, batch_size=4)
    dev = E.embed_batched(f, imgs, batch_size=4, return_device=True)
    assert isinstance(dev, jax.Array)
    np.testing.assert_array_equal(host, np.asarray(dev))


def test_embed_batched_grouped_drain_is_exact(rng, monkeypatch):
    """The host-return path drains device outputs in ~DRAIN_GROUP_BYTES
    groups (memory bound at 1M-gallery scale). Shrink the group size so a
    small sweep crosses several drains — including a padded tail inside
    the last group — and check bit-equality with the single-drain result."""
    import jax.numpy as jnp

    imgs = rng.standard_normal((37, 4, 4, 1)).astype(np.float32)
    f = lambda x: jnp.mean(x, axis=(1, 2))  # (B, 1) embedding
    one = E.embed_batched(f, imgs, batch_size=4)  # fits one group
    # 4 rows/batch * 1 col * 4 B = 16 B/batch -> drain every other batch
    monkeypatch.setattr(E, "DRAIN_GROUP_BYTES", 32)
    many = E.embed_batched(f, imgs, batch_size=4)
    assert many.shape == (37, 1)
    np.testing.assert_array_equal(one, many)


def test_loss_tracker_lazy_device_scalars():
    """add() must not sync: sums stay lazy jax scalars; append() floats."""
    import jax.numpy as jnp

    from art_sbir_tpu.core.metrics import LossTracker

    tr = LossTracker(["a"])
    for i in range(3):
        tr.add({"a": jnp.asarray(float(i))})
    assert isinstance(tr.sums["a"], jax.Array)  # still on device
    tr.append(dict(tr.sums), 3)
    assert isinstance(tr.series["a"][-1], float)
    np.testing.assert_allclose(tr.series["a"][-1], (0 + 1 + 2) / 3)
