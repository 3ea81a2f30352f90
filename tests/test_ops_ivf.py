"""IVF clustered index (`ops/ivf.py`) — build, exactness, recall contracts.

The reference has no approximate index (its retrieval is a per-query f32
full scan, reference `inference.py:43-56`); these tests lock the
beyond-reference IVF feature's contracts:

* k-means recovers separated blobs (assignment purity);
* ``nprobe == nlist`` is IDENTICAL to the exact path (`ops/distance.py`
  retrieve) — values, indices, and gallery-index tie order;
* recall on clustered data is high at small nprobe and monotone in it;
* padding/chunking/degenerate-k edge cases.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from art_sbir_tpu.ops.distance import retrieve
from art_sbir_tpu.ops.ivf import IVFIndex, build_ivf, ivf_search, kmeans
from art_sbir_tpu.ops.quant import topk_overlap


def _blobs(rng, n_per, centers, d, scale=0.05):
    """Well-separated gaussian blobs -> (rows, labels)."""
    rows, labels = [], []
    for i, c in enumerate(centers):
        rows.append(c + scale * rng.standard_normal((n_per, d)))
        labels += [i] * n_per
    x = np.concatenate(rows).astype(np.float32)
    perm = rng.permutation(len(x))
    return x[perm], np.asarray(labels)[perm]


def test_kmeans_recovers_separated_blobs():
    rng = np.random.default_rng(0)
    d = 16
    centers = rng.standard_normal((4, d)) * 5.0
    x, labels = _blobs(rng, 50, centers, d)
    cent = np.asarray(kmeans(jnp.asarray(x), 4, iters=15, seed=3))
    # every true center has a learned centroid within the blob scale
    dist = np.linalg.norm(centers[:, None] - cent[None], axis=-1)
    assert dist.min(axis=1).max() < 0.5
    # and the learned centroids are a permutation (no two collapse)
    assert len(set(dist.argmin(axis=1))) == 4


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_full_probe_matches_exact_path(metric):
    rng = np.random.default_rng(1)
    g = rng.standard_normal((200, 32)).astype(np.float32)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 8, metric=metric, iters=5, seed=0)
    vals, ids = ivf_search(jnp.asarray(q), idx, jnp.asarray(g),
                           nprobe=idx.nlist, k=7)
    _, ev, ei = retrieve(jnp.asarray(q), jnp.asarray(g),
                         jnp.zeros(16, jnp.int32), k=7, metric=metric)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ei))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ev),
                               rtol=1e-5, atol=1e-5)


def test_full_probe_tie_order_matches_exact_path():
    """Duplicate gallery rows land in one cluster (identical vectors share
    an argmin), but ties must still break by GALLERY INDEX across the
    probed candidate set — the exact path's documented order."""
    rng = np.random.default_rng(2)
    base = rng.standard_normal((40, 8)).astype(np.float32)
    g = np.concatenate([base, base[:13]])  # rows i and 40+i are duplicates
    q = base[:6] + 0.01 * rng.standard_normal((6, 8)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 5, iters=5, seed=1)
    vals, ids = ivf_search(jnp.asarray(q), idx, jnp.asarray(g),
                           nprobe=idx.nlist, k=10)
    _, ev, ei = retrieve(jnp.asarray(q), jnp.asarray(g),
                         jnp.zeros(6, jnp.int32), k=10)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ei))


def test_recall_on_clustered_data_and_monotone_in_nprobe():
    rng = np.random.default_rng(3)
    d = 24
    centers = rng.standard_normal((16, d)) * 4.0
    g, _ = _blobs(rng, 64, centers, d, scale=0.3)
    q = g[rng.integers(0, len(g), 32)] + 0.05 * rng.standard_normal(
        (32, d)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 16, iters=10, seed=0)
    _, _, exact_ids = retrieve(jnp.asarray(q), jnp.asarray(g),
                               jnp.zeros(32, jnp.int32), k=10)
    recalls = []
    for nprobe in (1, 2, 4, 16):
        _, ids = ivf_search(jnp.asarray(q), idx, jnp.asarray(g),
                            nprobe=nprobe, k=10)
        recalls.append(topk_overlap(ids, exact_ids))
    # on blob data one probe already lands most neighbors; full probe = 1
    assert recalls[0] > 0.8
    assert recalls[-1] == 1.0
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:]))


def test_padding_and_small_k_edges():
    """Uneven clusters pad to one width; k beyond the probed candidates
    yields +inf values with out-of-gallery indices (callers filter)."""
    rng = np.random.default_rng(4)
    # 3 rows near zero, 29 rows far away -> very uneven clusters
    g = np.concatenate([
        0.01 * rng.standard_normal((3, 8)),
        10.0 + rng.standard_normal((29, 8)),
    ]).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 2, iters=8, seed=0)
    st = idx.stats()
    assert st["nlist"] == 2 and st["pad_width"] % 8 == 0
    assert st["min_count"] + st["max_count"] == 32
    q = np.zeros((1, 8), np.float32)
    vals, ids = ivf_search(jnp.asarray(q), idx, jnp.asarray(g),
                           nprobe=1, k=16)
    v, i = np.asarray(vals[0]), np.asarray(ids[0])
    live = np.isfinite(v)
    assert 1 <= live.sum() <= 16
    assert (i[~live] == 32).all()  # pad slots point one past the gallery
    # the live head is ascending and exact
    _, ev, _ = retrieve(jnp.asarray(q), jnp.asarray(g),
                        jnp.zeros(1, jnp.int32), k=int(live.sum()))
    np.testing.assert_allclose(v[live][: live.sum()],
                               np.asarray(ev[0]), rtol=1e-5, atol=1e-5)


def test_query_chunking_matches_single_chunk():
    rng = np.random.default_rng(5)
    g = rng.standard_normal((128, 16)).astype(np.float32)
    q = rng.standard_normal((9, 16)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 6, iters=5, seed=0)
    v1, i1 = ivf_search(jnp.asarray(q), idx, jnp.asarray(g), nprobe=3, k=5)
    # row budget forcing one query per chunk
    v2, i2 = ivf_search(jnp.asarray(q), idx, jnp.asarray(g), nprobe=3, k=5,
                        row_budget_bytes=1)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_bf16_resident_gallery_rows_cast_after_gather():
    rng = np.random.default_rng(6)
    g = rng.standard_normal((64, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 4, iters=5, seed=0)
    v32, i32 = ivf_search(jnp.asarray(q), idx, jnp.asarray(g),
                          nprobe=4, k=5)
    v16, i16 = ivf_search(jnp.asarray(q), idx,
                          jnp.asarray(g).astype(jnp.bfloat16),
                          nprobe=4, k=5)
    # bf16 rounding perturbs values ~1e-2 relative; candidate sets stay put
    assert topk_overlap(i16, i32) >= 0.8
    np.testing.assert_allclose(np.asarray(v16), np.asarray(v32),
                               rtol=2e-2, atol=2e-2)


def test_build_validation():
    g = jnp.zeros((4, 8), jnp.float32)
    with pytest.raises(ValueError):
        build_ivf(g, 5)  # more clusters than rows
    with pytest.raises(ValueError):
        build_ivf(jnp.zeros((0, 8)), 1)
    with pytest.raises(ValueError):
        build_ivf(g, 2, metric="dot")
    idx = build_ivf(g + jnp.arange(4)[:, None], 2, iters=2)
    with pytest.raises(ValueError):
        ivf_search(jnp.zeros((1, 8)), idx, g, nprobe=0)


def test_empty_query_batch():
    g = jnp.asarray(np.random.default_rng(7).standard_normal((32, 8)),
                    jnp.float32)
    idx = build_ivf(g, 4, iters=3)
    vals, ids = ivf_search(jnp.zeros((0, 8)), idx, g, nprobe=2, k=5)
    assert vals.shape == (0, 5) and ids.shape == (0, 5)


# --------------------------------------------------------------- online IVF


def _exact_masked(q, buf, mask, k):
    """Oracle: the engine's maskable full-scan program."""
    from art_sbir_tpu.ops.distance import pairwise_distance, top_k

    d = pairwise_distance(jnp.asarray(q), jnp.asarray(buf))
    return top_k(d, k, valid=jnp.asarray(mask))


def test_online_ivf_matches_masked_exact_through_churn():
    """Full-probe online IVF == the maskable full scan across a whole
    add/remove/re-add churn sequence (indices exactly, values to the
    expanded-form cancellation floor)."""
    from art_sbir_tpu.ops.ivf import build_ivf_online

    rng = np.random.default_rng(10)
    d, cap, n0 = 16, 64, 24
    buf = np.zeros((cap, d), np.float32)
    buf[:n0] = rng.standard_normal((n0, d))
    oiv = build_ivf_online(jnp.asarray(buf), n0, 4, iters=5)
    mask = np.zeros(cap, bool)
    mask[:n0] = True
    q = rng.standard_normal((8, d)).astype(np.float32)

    def check():
        v, i = oiv.search(jnp.asarray(q), jnp.asarray(buf),
                          nprobe=oiv.nlist, k=6, mask=jnp.asarray(mask))
        ev, ei = _exact_masked(q, buf, mask, 6)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))
        np.testing.assert_allclose(np.asarray(v), np.asarray(ev),
                                   rtol=1e-4, atol=1e-3)

    check()
    new = rng.standard_normal((16, d)).astype(np.float32)
    buf[24:40], mask[24:40] = new, True
    oiv.add(list(range(24, 40)), jnp.asarray(new))
    check()
    for r in (3, 30, 25):  # initial + added rows
        mask[r] = False
        oiv.remove(r)
    check()
    buf[3] = rng.standard_normal(d).astype(np.float32)  # freed-slot reuse
    mask[3] = True
    oiv.add([3], jnp.asarray(buf[3][None]))
    check()
    st = oiv.stats()
    assert st["live_rows"] == n0 + 16 - 3 + 1
    assert st["repacks"] == 0


def test_online_ivf_spill_then_repack():
    """Cluster overflow spills (always scanned — recall is never lost);
    a full spill triggers one table repack with wider padding."""
    from art_sbir_tpu.ops.ivf import build_ivf_online

    rng = np.random.default_rng(11)
    d, cap = 8, 128
    c0 = np.zeros(d, np.float32)
    c1 = np.full(d, 10.0, np.float32)
    buf = np.zeros((cap, d), np.float32)
    buf[:8] = c0 + 0.1 * rng.standard_normal((8, d))
    buf[8:16] = c1 + 0.1 * rng.standard_normal((8, d))
    mask = np.zeros(cap, bool)
    mask[:16] = True
    oiv = build_ivf_online(jnp.asarray(buf), 16, 2, iters=8,
                           spill_capacity=8)
    assert oiv.stats()["pad_width"] == 8  # both clusters born full

    q = np.stack([c0 + 0.05, c1 - 0.05]).astype(np.float32)

    def check():
        v, i = oiv.search(jnp.asarray(q), jnp.asarray(buf), nprobe=2,
                          k=10, mask=jnp.asarray(mask))
        ev, ei = _exact_masked(q, buf, mask, 10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))

    new = (c0 + 0.1 * rng.standard_normal((8, d))).astype(np.float32)
    buf[16:24], mask[16:24] = new, True
    oiv.add(list(range(16, 24)), jnp.asarray(new))  # cluster 0 overflows
    st = oiv.stats()
    assert st["spill_used"] == 8 and st["repacks"] == 0
    check()

    buf[24] = c0 + 0.01  # spill is full -> repack, then table insert
    mask[24] = True
    oiv.add([24], jnp.asarray(buf[24][None]))
    st = oiv.stats()
    assert st["repacks"] == 1 and st["spill_used"] == 0
    assert st["pad_width"] > 8
    check()

    mask[17] = False  # spilled-then-repacked row removes cleanly
    oiv.remove(17)
    check()


def test_online_ivf_mask_gates_unpublished_rows():
    """A row present in the cluster table but not in the live mask must
    not surface — the mask is the correctness source of truth (covers
    the engine's add-publish race window)."""
    from art_sbir_tpu.ops.ivf import build_ivf_online

    rng = np.random.default_rng(12)
    d, cap, n0 = 8, 32, 8
    buf = np.zeros((cap, d), np.float32)
    buf[:n0] = rng.standard_normal((n0, d))
    oiv = build_ivf_online(jnp.asarray(buf), n0, 2, iters=5)
    mask = np.zeros(cap, bool)
    mask[:n0] = True
    buf[n0] = buf[0]  # exact duplicate of row 0, indexed but NOT live
    oiv.add([n0], jnp.asarray(buf[n0][None]))
    _, ids = oiv.search(jnp.asarray(buf[0][None]), jnp.asarray(buf),
                        nprobe=2, k=5, mask=jnp.asarray(mask))
    assert n0 not in np.asarray(ids)
    # published: now it ties with row 0 and sorts after it by index
    mask[n0] = True
    _, ids = oiv.search(jnp.asarray(buf[0][None]), jnp.asarray(buf),
                        nprobe=2, k=5, mask=jnp.asarray(mask))
    assert list(np.asarray(ids)[0, :2]) == [0, n0]


def test_online_ivf_padded_add_and_validation():
    from art_sbir_tpu.ops.ivf import build_ivf_online

    rng = np.random.default_rng(13)
    d, cap, n0 = 8, 16, 4
    buf = np.zeros((cap, d), np.float32)
    buf[:n0] = rng.standard_normal((n0, d))
    oiv = build_ivf_online(jnp.asarray(buf), n0, 2, iters=3)
    # bucketed (padded) embedding batch: trailing rows ignored
    rows = rng.standard_normal((4, d)).astype(np.float32)
    oiv.add([n0], jnp.asarray(rows))
    assert oiv.stats()["live_rows"] == n0 + 1
    with pytest.raises(ValueError, match="already indexed"):
        oiv.add([n0], jnp.asarray(rows))
    with pytest.raises(ValueError, match="outside"):
        oiv.add([cap], jnp.asarray(rows))
    with pytest.raises(ValueError, match="ids vs"):
        oiv.add([1, 2, 3, 4, 5], jnp.asarray(rows))
    with pytest.raises(KeyError):
        oiv.remove(cap - 1)
    with pytest.raises(ValueError, match=">= 1 initial"):
        build_ivf_online(jnp.asarray(buf), 0, 2)
    oiv.add([], jnp.zeros((0, d)))  # no-op


def test_tune_nprobe_meets_target_and_validates():
    """tune_nprobe returns the smallest power-of-two nprobe whose
    recall@k on the tuning queries meets the target; the returned value
    must actually deliver that recall when re-measured."""
    from art_sbir_tpu.ops.ivf import tune_nprobe

    rng = np.random.default_rng(7)
    d = 24
    centers = rng.standard_normal((16, d)) * 4.0
    g, _ = _blobs(rng, 64, centers, d, scale=0.3)
    q = g[rng.integers(0, len(g), 32)] + 0.05 * rng.standard_normal(
        (32, d)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 16, iters=10, seed=0)
    tuned = tune_nprobe(idx, jnp.asarray(g), jnp.asarray(q), k=10,
                        target_recall=0.95)
    assert 1 <= tuned <= idx.nlist
    # on well-separated blobs the probe is genuinely sublinear
    assert tuned <= 4
    _, _, exact_ids = retrieve(jnp.asarray(q), jnp.asarray(g),
                               jnp.zeros(32, jnp.int32), k=10)
    _, ids = ivf_search(jnp.asarray(q), idx, jnp.asarray(g),
                        nprobe=tuned, k=10)
    assert topk_overlap(ids, exact_ids) >= 0.95
    # target 1.0 is always satisfiable (full probe == exact path)
    full = tune_nprobe(idx, jnp.asarray(g), jnp.asarray(q), k=10,
                       target_recall=1.0)
    assert full <= idx.nlist
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="target_recall"):
            tune_nprobe(idx, jnp.asarray(g), jnp.asarray(q),
                        target_recall=bad)


def test_tune_nprobe_margin():
    """margin multiplies the tuned choice (the serving engine passes
    margin=2 because the perturbed-row proxy measured one power of two
    optimistic vs real cross-modal queries at scale — round 5,
    goldens/ann_learned_tpu.json), capped at nlist; margin < 1 raises."""
    from art_sbir_tpu.ops.ivf import tune_nprobe

    rng = np.random.default_rng(7)
    d = 24
    centers = rng.standard_normal((16, d)) * 4.0
    g, _ = _blobs(rng, 64, centers, d, scale=0.3)
    q = g[rng.integers(0, len(g), 32)] + 0.05 * rng.standard_normal(
        (32, d)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 16, iters=10, seed=0)
    base = tune_nprobe(idx, jnp.asarray(g), jnp.asarray(q), k=10)
    with_margin = tune_nprobe(idx, jnp.asarray(g), jnp.asarray(q), k=10,
                              margin=2)
    assert with_margin == min(base * 2, idx.nlist)
    # a margin larger than nlist/base caps at nlist (the exact path)
    capped = tune_nprobe(idx, jnp.asarray(g), jnp.asarray(q), k=10,
                         margin=10 * idx.nlist)
    assert capped == idx.nlist
    with pytest.raises(ValueError, match="margin"):
        tune_nprobe(idx, jnp.asarray(g), jnp.asarray(q), margin=0)


def test_tune_nprobe_cosine_uses_cosine_oracle():
    """A cosine index must tune against the COSINE exact path: rows are
    direction-clustered at wildly mixed norms, so the euclidean and
    cosine top-k disagree; tuning against the wrong oracle would chase
    unreachable euclidean neighbors all the way to nprobe == nlist."""
    from art_sbir_tpu.ops.ivf import tune_nprobe

    rng = np.random.default_rng(11)
    d = 16
    dirs = rng.standard_normal((8, d))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = []
    for c in dirs:
        u = c + 0.05 * rng.standard_normal((40, d))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        rows.append(u * rng.uniform(0.1, 10.0, (40, 1)))
    g = np.concatenate(rows).astype(np.float32)
    q = (dirs + 0.02 * rng.standard_normal((8, d))).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 8, metric="cosine", iters=10, seed=0)
    tuned = tune_nprobe(idx, jnp.asarray(g), jnp.asarray(q), k=10,
                        target_recall=0.95)
    assert tuned <= 2  # one direction blob ~= one spherical cluster
    _, _, exact_ids = retrieve(jnp.asarray(q), jnp.asarray(g),
                               jnp.zeros(8, jnp.int32), k=10,
                               metric="cosine")
    _, ids = ivf_search(jnp.asarray(q), idx, jnp.asarray(g),
                        nprobe=tuned, k=10)
    assert topk_overlap(ids, exact_ids) >= 0.95


def _mesh8():
    import jax

    from art_sbir_tpu.parallel.mesh import MeshSpec

    return MeshSpec(data=len(jax.devices())).build()


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_sharded_full_probe_matches_exact_path(metric):
    """nprobe == nlist: every shard scans all its rows, so the lexsort
    merge must reproduce the exact path bit-for-bit on indices — values,
    indices, and the ascending-gallery-index tie order."""
    from art_sbir_tpu.ops.ivf import build_ivf_sharded, ivf_search_sharded

    mesh = _mesh8()
    s = mesh.devices.size
    rng = np.random.default_rng(4)
    g = rng.standard_normal((64 * s, 32)).astype(np.float32)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    sidx = build_ivf_sharded(jnp.asarray(g), s, 4, metric=metric, iters=5)
    assert sidx.n_shards == s and sidx.nlist == 4
    vals, ids = ivf_search_sharded(jnp.asarray(q), sidx, jnp.asarray(g),
                                   mesh, nprobe=sidx.nlist, k=7)
    _, ev, ei = retrieve(jnp.asarray(q), jnp.asarray(g),
                         jnp.zeros(16, jnp.int32), k=7, metric=metric)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ei))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ev),
                               rtol=1e-5, atol=1e-5)


def test_sharded_tie_order_across_shards():
    """Duplicate rows living on DIFFERENT shards must still tie-break by
    global gallery index after the merge."""
    from art_sbir_tpu.ops.ivf import build_ivf_sharded, ivf_search_sharded

    mesh = _mesh8()
    s = mesh.devices.size
    rng = np.random.default_rng(5)
    base = rng.standard_normal((16, 8)).astype(np.float32)
    g = np.concatenate([base] * s)  # row i duplicated on every shard
    q = base[:4] + 0.01 * rng.standard_normal((4, 8)).astype(np.float32)
    sidx = build_ivf_sharded(jnp.asarray(g), s, 2, iters=4)
    vals, ids = ivf_search_sharded(jnp.asarray(q), sidx, jnp.asarray(g),
                                   mesh, nprobe=2, k=s)
    _, ev, ei = retrieve(jnp.asarray(q), jnp.asarray(g),
                         jnp.zeros(4, jnp.int32), k=s)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ei))


def test_sharded_recall_and_monotone_in_nprobe():
    from art_sbir_tpu.ops.ivf import build_ivf_sharded, ivf_search_sharded

    mesh = _mesh8()
    s = mesh.devices.size
    rng = np.random.default_rng(6)
    d = 24
    centers = rng.standard_normal((16, d)) * 4.0
    g, _ = _blobs(rng, 16 * s, centers, d, scale=0.3)
    q = g[rng.integers(0, len(g), 32)] + 0.05 * rng.standard_normal(
        (32, d)).astype(np.float32)
    sidx = build_ivf_sharded(jnp.asarray(g), s, 8, iters=8)
    _, _, exact_ids = retrieve(jnp.asarray(q), jnp.asarray(g),
                               jnp.zeros(32, jnp.int32), k=10)
    recalls = []
    for nprobe in (1, 2, 8):
        _, ids = ivf_search_sharded(jnp.asarray(q), sidx, jnp.asarray(g),
                                    mesh, nprobe=nprobe, k=10)
        recalls.append(topk_overlap(ids, exact_ids))
    assert recalls[0] > 0.8  # per-shard probing: s*nprobe clusters total
    assert recalls[-1] == 1.0
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:]))


def test_sharded_validation_and_edges():
    from art_sbir_tpu.ops.ivf import (build_ivf_sharded, ivf_search_sharded,
                                      tune_nprobe)

    mesh = _mesh8()
    s = mesh.devices.size
    rng = np.random.default_rng(8)
    g = rng.standard_normal((16 * s, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="divisible"):
        build_ivf_sharded(jnp.asarray(g[:-1]), s, 2)
    sidx = build_ivf_sharded(jnp.asarray(g), s, 2, iters=3)
    q = jnp.asarray(g[:3])
    with pytest.raises(ValueError, match="nprobe"):
        ivf_search_sharded(q, sidx, jnp.asarray(g), mesh, nprobe=0)
    with pytest.raises(ValueError, match="exceeds the per-shard"):
        ivf_search_sharded(q, sidx, jnp.asarray(g), mesh, k=17)
    with pytest.raises(ValueError, match="shards"):
        ivf_search_sharded(q, sidx, jnp.asarray(g[: 16 * s // 2]),
                           mesh, k=2)
    # empty query batch
    v, i = ivf_search_sharded(jnp.zeros((0, 8)), sidx, jnp.asarray(g),
                              mesh, k=3)
    assert v.shape == (0, 3) and i.shape == (0, 3)
    # host query chunking (tiny row budget) == one-shot
    v1, i1 = ivf_search_sharded(q, sidx, jnp.asarray(g), mesh, nprobe=2,
                                k=5)
    v2, i2 = ivf_search_sharded(q, sidx, jnp.asarray(g), mesh, nprobe=2,
                                k=5, row_budget_bytes=1)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    # tune_nprobe drives the sharded probe through search_fn
    tuned = tune_nprobe(
        sidx, jnp.asarray(g), q, k=5,
        search_fn=lambda qq, np_, kk: ivf_search_sharded(
            qq, sidx, jnp.asarray(g), mesh, nprobe=np_, k=kk))
    assert 1 <= tuned <= sidx.nlist


def test_sharded_online_full_probe_matches_masked_exact_through_churn():
    """ShardedOnlineIVF full probe == the maskable full scan across an
    add/remove/re-add churn whose adds span shard boundaries and land in
    shards that started EMPTY (the engine fills capacity slots in global
    order, so trailing shards begin with no rows)."""
    from art_sbir_tpu.ops.ivf import build_ivf_sharded_online

    mesh = _mesh8()
    s = mesh.devices.size
    rng = np.random.default_rng(12)
    d, cap_local, n0 = 16, 16, 24  # shards 2+ start empty
    cap = s * cap_local
    buf = np.zeros((cap, d), np.float32)
    buf[:n0] = rng.standard_normal((n0, d))
    siv = build_ivf_sharded_online(jnp.asarray(buf), n0, s, 4, iters=5)
    assert siv.n_shards == s and siv.capacity == cap
    mask = np.zeros(cap, bool)
    mask[:n0] = True
    q = rng.standard_normal((8, d)).astype(np.float32)

    def check():
        v, i = siv.search(jnp.asarray(q), jnp.asarray(buf), mesh,
                          nprobe=siv.nlist, k=6, mask=jnp.asarray(mask))
        ev, ei = _exact_masked(q, buf, mask, 6)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))
        np.testing.assert_allclose(np.asarray(v), np.asarray(ev),
                                   rtol=1e-4, atol=1e-3)

    check()
    new = rng.standard_normal((16, d)).astype(np.float32)
    buf[24:40], mask[24:40] = new, True  # spans shards 1-2
    siv.add(list(range(24, 40)), jnp.asarray(new))
    check()
    for r in (3, 30, 25):
        mask[r] = False
        siv.remove(r)
    check()
    buf[3] = rng.standard_normal(d).astype(np.float32)  # freed-slot reuse
    mask[3] = True
    siv.add([3], jnp.asarray(buf[3][None]))
    check()
    st = siv.stats()
    assert st["live_rows"] == n0 + 16 - 3 + 1
    assert st["n_shards"] == s and st["rows_per_shard"] == cap_local


def test_sharded_online_equals_single_device_at_every_nprobe():
    """Shared centroids mean the sharded probe gathers the SAME global
    candidate set as the single-device OnlineIVF at every nprobe (spill
    aside) — results must be identical, not just full-probe-equal."""
    from art_sbir_tpu.ops.ivf import build_ivf_online, \
        build_ivf_sharded_online

    mesh = _mesh8()
    s = mesh.devices.size
    rng = np.random.default_rng(13)
    d, cap_local, n0 = 24, 8, 40
    cap = s * cap_local
    centers = rng.standard_normal((4, d)) * 6.0
    rows0, _ = _blobs(rng, 10, centers, d, scale=0.3)  # balanced blobs:
    buf = np.zeros((cap, d), np.float32)               # pad roundup gives
    buf[:n0] = rows0                                   # every cluster slack
    oiv = build_ivf_online(jnp.asarray(buf), n0, 4, iters=8)
    siv = build_ivf_sharded_online(jnp.asarray(buf), n0, s, 4, iters=8)
    np.testing.assert_array_equal(np.asarray(oiv.centroids),
                                  np.asarray(siv.centroids))
    mask = np.zeros(cap, bool)
    mask[:n0] = True
    new, _ = _blobs(rng, 3, centers, d, scale=0.3)  # 3 adds per cluster
    buf[n0:n0 + 12], mask[n0:n0 + 12] = new, True
    oiv.add(list(range(n0, n0 + 12)), jnp.asarray(new))
    siv.add(list(range(n0, n0 + 12)), jnp.asarray(new))
    assert oiv.stats()["spill_used"] == 0  # the premise of equality
    assert siv.stats()["spill_used"] == 0
    q = rng.standard_normal((8, d)).astype(np.float32)
    for nprobe in (1, 2, 4):
        ov, oi = oiv.search(jnp.asarray(q), jnp.asarray(buf),
                            nprobe=nprobe, k=5, mask=jnp.asarray(mask))
        sv, si = siv.search(jnp.asarray(q), jnp.asarray(buf), mesh,
                            nprobe=nprobe, k=5, mask=jnp.asarray(mask))
        np.testing.assert_array_equal(np.asarray(oi), np.asarray(si))
        np.testing.assert_allclose(np.asarray(ov), np.asarray(sv),
                                   rtol=1e-5, atol=1e-5)


def test_sharded_online_validation():
    from art_sbir_tpu.ops.ivf import build_ivf_sharded_online

    mesh = _mesh8()
    s = mesh.devices.size
    rng = np.random.default_rng(14)
    buf = rng.standard_normal((s * 8, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="divisible"):
        build_ivf_sharded_online(jnp.asarray(buf[:-1]), 4, s, 2)
    with pytest.raises(ValueError, match="initial live row"):
        build_ivf_sharded_online(jnp.asarray(buf), 0, s, 2)
    siv = build_ivf_sharded_online(jnp.asarray(buf), 8, s, 2, iters=3)
    with pytest.raises(ValueError, match="outside"):
        siv.add([s * 8], jnp.zeros((1, 8)))
    with pytest.raises(ValueError, match="ids vs"):
        siv.add([8, 9], jnp.zeros((1, 8)))
    with pytest.raises(KeyError, match="not in the IVF index"):
        siv.remove(s * 8 - 1)  # valid slot, never added
    siv.add([9], jnp.zeros((1, 8)))  # shard 1's first row
    siv.remove(9)


def test_sharded_save_load_roundtrip(tmp_path):
    from art_sbir_tpu.ops.ivf import (build_ivf_sharded, ivf_search_sharded,
                                      load_ivf_sharded, save_ivf_sharded)

    mesh = _mesh8()
    s = mesh.devices.size
    rng = np.random.default_rng(15)
    g = rng.standard_normal((16 * s, 16)).astype(np.float32)
    q = g[:5] + 0.01
    sidx = build_ivf_sharded(jnp.asarray(g), s, 4, iters=4)
    save_ivf_sharded(sidx, tmp_path / "s.npz")
    back = load_ivf_sharded(tmp_path / "s.npz")
    assert (back.metric, back.n_local) == (sidx.metric, sidx.n_local)
    np.testing.assert_array_equal(np.asarray(back.row_ids),
                                  np.asarray(sidx.row_ids))
    np.testing.assert_array_equal(back.counts, sidx.counts)
    v0, i0 = ivf_search_sharded(jnp.asarray(q), sidx, jnp.asarray(g),
                                mesh, nprobe=2, k=5)
    v1, i1 = ivf_search_sharded(jnp.asarray(q), back, jnp.asarray(g),
                                mesh, nprobe=2, k=5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
