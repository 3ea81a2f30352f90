"""Product quantization (`ops/pq.py`) — codebooks, ADC scoring, IVF-PQ.

A beyond-reference capacity feature (the reference full-scans f32,
reference `inference.py:43-56`). Contracts locked here:

* per-subspace codebooks recover planted subspace structure and
  reconstruction error shrinks as the codebook grows;
* full probe + full exact rerank is IDENTICAL to the exact path
  (`ops/distance.py` retrieve) — values, indices, tie order — for both
  metrics (the PQ stage then only ORDERS candidates, all of which get
  exact scores);
* pure-PQ mode: self-retrieval on separated data, value units
  (euclidean distance / cosine distance in [0, 2]);
* recall floors on clustered data with small probes and small reranks;
* chunking, empty batches, validation errors.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from art_sbir_tpu.ops.distance import retrieve
from art_sbir_tpu.ops.ivf import build_ivf
from art_sbir_tpu.ops.pq import (
    PQCodebook,
    encode_pq,
    ivf_pq_search,
    pq_decode,
    train_pq,
)
from art_sbir_tpu.ops.quant import topk_overlap


def _planted(rng, n, m, ds, per_sub=4, noise=0.01):
    """Rows whose m-th subspace is one of ``per_sub`` planted vectors."""
    vocab = rng.standard_normal((m, per_sub, ds)).astype(np.float32) * 3.0
    pick = rng.integers(0, per_sub, (n, m))
    rows = np.concatenate(
        [vocab[j, pick[:, j]] for j in range(m)], axis=1).astype(np.float32)
    rows += noise * rng.standard_normal(rows.shape).astype(np.float32)
    return rows, vocab


def test_codebook_recovers_planted_subspaces_and_roundtrips():
    rng = np.random.default_rng(0)
    m, ds = 4, 8
    rows, vocab = _planted(rng, 512, m, ds)
    cb = train_pq(jnp.asarray(rows), m, k_codes=4, iters=15, seed=1)
    # every planted subspace vector has a centroid within the noise scale
    cent = np.asarray(cb.centroids)  # (M, 4, ds)
    for j in range(m):
        d = np.linalg.norm(vocab[j][:, None] - cent[j][None], axis=-1)
        assert d.min(axis=1).max() < 0.1, (j, d.min(axis=1))
    codes = encode_pq(jnp.asarray(rows), cb)
    assert codes.shape == (512, m) and codes.dtype == jnp.uint8
    rec = np.asarray(pq_decode(codes, cb))
    err = np.linalg.norm(rec - rows, axis=1) / np.linalg.norm(rows, axis=1)
    assert err.max() < 0.02, err.max()


def test_reconstruction_error_shrinks_with_codebook_size():
    rng = np.random.default_rng(1)
    rows = rng.standard_normal((1024, 32)).astype(np.float32)
    errs = []
    for k_codes in (4, 16, 64):
        cb = train_pq(jnp.asarray(rows), 4, k_codes=k_codes, iters=8, seed=0)
        rec = np.asarray(pq_decode(encode_pq(jnp.asarray(rows), cb), cb))
        errs.append(float(np.mean(np.sum((rec - rows) ** 2, axis=1))))
    assert errs[0] > errs[1] > errs[2], errs


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_full_probe_full_rerank_matches_exact_path(metric):
    """nprobe == nlist and rerank covering the whole candidate set: the
    PQ stage only permutes candidates that ALL get exact scores, so the
    result equals the exact path bit-for-bit (incl. gallery-index ties)."""
    rng = np.random.default_rng(2)
    g = rng.standard_normal((200, 32)).astype(np.float32)
    g = np.concatenate([g, g[:9]])  # duplicate rows -> ties
    q = rng.standard_normal((16, 32)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 8, metric=metric, iters=5, seed=0)
    cb = train_pq(jnp.asarray(g), 8, k_codes=16, metric=metric, iters=5)
    codes = encode_pq(jnp.asarray(g), cb)
    vals, ids = ivf_pq_search(
        jnp.asarray(q), idx, codes, cb, nprobe=idx.nlist, k=7,
        rows=jnp.asarray(g), rerank_factor=1000)  # r covers everything
    _, ev, ei = retrieve(jnp.asarray(q), jnp.asarray(g),
                         jnp.zeros(16, jnp.int32), k=7, metric=metric)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ei))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ev),
                               rtol=1e-5, atol=1e-5)


def test_pure_pq_self_retrieval_and_units():
    rng = np.random.default_rng(3)
    # well-separated rows: quantization error << row separation
    g = (10.0 * rng.standard_normal((64, 16))).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 4, iters=8, seed=0)
    cb = train_pq(jnp.asarray(g), 4, k_codes=64, iters=10)
    codes = encode_pq(jnp.asarray(g), cb)
    vals, ids = ivf_pq_search(jnp.asarray(g), idx, codes, cb,
                              nprobe=idx.nlist, k=3)
    assert (np.asarray(ids)[:, 0] == np.arange(64)).all()
    v = np.asarray(vals)
    assert np.isfinite(v[:, :1]).all() and (v[:, 0] >= 0).all()
    # self-distance = reconstruction error, far below the nearest other row
    assert (v[:, 0] < 0.5 * v[:, 1]).all()

    ccb = train_pq(jnp.asarray(g), 4, k_codes=64, metric="cosine", iters=10)
    cidx = build_ivf(jnp.asarray(g), 4, metric="cosine", iters=8)
    cvals, cids = ivf_pq_search(jnp.asarray(g), cidx,
                                encode_pq(jnp.asarray(g), ccb), ccb,
                                nprobe=cidx.nlist, k=3)
    assert (np.asarray(cids)[:, 0] == np.arange(64)).all()
    cv = np.asarray(cvals)
    assert (cv >= -1e-5).all() and (cv[np.isfinite(cv)] <= 2.0 + 1e-5).all()


def test_recall_floor_on_clustered_data_small_probe():
    rng = np.random.default_rng(4)
    d = 32
    centers = rng.standard_normal((8, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, 8, 512)
    g = (centers[assign]
         + 0.3 * rng.standard_normal((512, d))).astype(np.float32)
    q = g[rng.integers(0, 512, 32)] + 0.05 * rng.standard_normal(
        (32, d)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 8, iters=10, seed=0)
    cb = train_pq(jnp.asarray(g), 8, k_codes=64, iters=10)
    codes = encode_pq(jnp.asarray(g), cb)
    _, _, exact_ids = retrieve(jnp.asarray(q), jnp.asarray(g),
                               jnp.zeros(32, jnp.int32), k=10)
    # rerank mode: exact values, candidate misses are the only error
    _, ids = ivf_pq_search(jnp.asarray(q), idx, codes, cb, nprobe=2, k=10,
                           rows=jnp.asarray(g), rerank_factor=4)
    assert topk_overlap(ids, exact_ids) > 0.85
    # pure-PQ mode: ADC ordering alone (measured 0.575 on this config —
    # tight blobs where within-blob gaps are comparable to the
    # quantization error; the rerank mode above is the quality path)
    _, ids_pure = ivf_pq_search(jnp.asarray(q), idx, codes, cb,
                                nprobe=2, k=10)
    assert topk_overlap(ids_pure, exact_ids) > 0.5


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_residual_full_probe_full_rerank_matches_exact_path(metric):
    """The residual (FAISS by_residual) build keeps the same exactness
    contract: full probe + rerank covering every candidate == the exact
    path, values/indices/tie order."""
    from art_sbir_tpu.ops.pq import build_ivf_pq

    rng = np.random.default_rng(7)
    g = rng.standard_normal((200, 32)).astype(np.float32)
    g = np.concatenate([g, g[:9]])  # duplicates -> ties
    q = rng.standard_normal((16, 32)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 8, metric=metric, iters=5, seed=0)
    cb, codes = build_ivf_pq(jnp.asarray(g), idx, 8, k_codes=16, iters=5)
    assert cb.residual and cb.metric == metric
    vals, ids = ivf_pq_search(
        jnp.asarray(q), idx, codes, cb, nprobe=idx.nlist, k=7,
        rows=jnp.asarray(g), rerank_factor=1000)
    _, ev, ei = retrieve(jnp.asarray(q), jnp.asarray(g),
                         jnp.zeros(16, jnp.int32), k=7, metric=metric)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ei))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ev),
                               rtol=1e-5, atol=1e-5)


def test_residual_beats_raw_pq_on_many_blobs():
    """The failure mode that motivated residual encoding, in miniature:
    with many clusters and a codebook too small to model both blob
    centers AND within-blob noise, raw-row PQ gives every row of a
    cluster the same code (ADC cannot rank within the cluster — the
    600k TPU measurement collapsed to ~0.12, PERF.md) while residual
    codes spend all their capacity on the within-cluster variation."""
    from art_sbir_tpu.ops.pq import build_ivf_pq

    rng = np.random.default_rng(8)
    d, n_blobs, per = 64, 64, 16
    centers = 6.0 * rng.standard_normal((n_blobs, d)).astype(np.float32)
    g = (np.repeat(centers, per, axis=0)
         + 0.5 * rng.standard_normal((n_blobs * per, d))).astype(np.float32)
    q = g[rng.integers(0, len(g), 32)] + 0.1 * rng.standard_normal(
        (32, d)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), n_blobs, iters=10, seed=0)
    _, _, exact_ids = retrieve(jnp.asarray(q), jnp.asarray(g),
                               jnp.zeros(32, jnp.int32), k=10)

    raw_cb = train_pq(jnp.asarray(g), 8, k_codes=64, iters=8)
    raw_codes = encode_pq(jnp.asarray(g), raw_cb)
    _, raw_ids = ivf_pq_search(jnp.asarray(q), idx, raw_codes, raw_cb,
                               nprobe=4, k=10)
    raw = topk_overlap(raw_ids, exact_ids)

    cb, codes = build_ivf_pq(jnp.asarray(g), idx, 8, k_codes=64, iters=8)
    _, res_ids = ivf_pq_search(jnp.asarray(q), idx, codes, cb,
                               nprobe=4, k=10)
    res = topk_overlap(res_ids, exact_ids)
    # measured on this recipe: raw 0.631, residual 0.822 (the miniature
    # softens the full-scale collapse — with only 4x16 candidates per
    # probe even arbitrary ordering overlaps; the 600k TPU measurement
    # is the hard evidence: raw 0.12 -> residual, PERF.md)
    assert res > raw + 0.15, (raw, res)
    assert res > 0.8, res
    # pure residual self-retrieval on the rows themselves
    _, self_ids = ivf_pq_search(jnp.asarray(g[:16]), idx, codes, cb,
                                nprobe=1, k=1)
    assert (np.asarray(self_ids)[:, 0] == np.arange(16)).all()


def test_query_chunking_matches_single_chunk():
    rng = np.random.default_rng(5)
    g = rng.standard_normal((128, 16)).astype(np.float32)
    q = rng.standard_normal((9, 16)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 6, iters=5, seed=0)
    cb = train_pq(jnp.asarray(g), 4, k_codes=16, iters=5)
    codes = encode_pq(jnp.asarray(g), cb)
    v1, i1 = ivf_pq_search(jnp.asarray(q), idx, codes, cb, nprobe=3, k=5)
    v2, i2 = ivf_pq_search(jnp.asarray(q), idx, codes, cb, nprobe=3, k=5,
                           row_budget_bytes=1)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    ve, ie = ivf_pq_search(jnp.zeros((0, 16)), idx, codes, cb, nprobe=3, k=5)
    assert ve.shape == (0, 5) and ie.shape == (0, 5)


def test_opq_rotation_orthogonal_and_cuts_correlated_error():
    """OPQ (Ge et al. 2013): on rows with strong cross-subspace
    correlation (a low-rank mix), the learned orthogonal rotation lets
    independent per-subspace codebooks spend capacity where the variance
    is — reconstruction error drops vs plain PQ at identical bytes."""
    from art_sbir_tpu.ops.pq import train_pq

    rng = np.random.default_rng(14)
    d, m, n = 32, 8, 2048
    mix = rng.standard_normal((8, d)).astype(np.float32)
    x = (rng.standard_normal((n, 8)).astype(np.float32) @ mix
         + 0.05 * rng.standard_normal((n, d))).astype(np.float32)
    pq = train_pq(jnp.asarray(x), m, k_codes=16, iters=8, seed=0)
    opq = train_pq(jnp.asarray(x), m, k_codes=16, iters=8, seed=0,
                   opq_iters=5)
    r = np.asarray(opq.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(d), atol=1e-4)

    def mse(cb):
        rec = np.asarray(pq_decode(encode_pq(jnp.asarray(x), cb), cb))
        return float(np.mean(np.sum((rec - x) ** 2, axis=1)))

    assert mse(opq) < 0.9 * mse(pq), (mse(opq), mse(pq))


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_opq_full_probe_full_rerank_matches_exact_path(metric):
    """The rotation is orthogonal, so every exactness contract is
    unchanged: OPQ residual build, full probe + full rerank == exact."""
    from art_sbir_tpu.ops.pq import build_ivf_pq

    rng = np.random.default_rng(15)
    g = rng.standard_normal((150, 32)).astype(np.float32)
    q = rng.standard_normal((8, 32)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 6, metric=metric, iters=5, seed=0)
    cb, codes = build_ivf_pq(jnp.asarray(g), idx, 8, k_codes=16, iters=5,
                             opq_iters=3)
    assert cb.rotation is not None and cb.residual
    vals, ids = ivf_pq_search(
        jnp.asarray(q), idx, codes, cb, nprobe=idx.nlist, k=7,
        rows=jnp.asarray(g), rerank_factor=1000)
    _, ev, ei = retrieve(jnp.asarray(q), jnp.asarray(g),
                         jnp.zeros(8, jnp.int32), k=7, metric=metric)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ei))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ev),
                               rtol=1e-5, atol=1e-5)


def test_opq_save_load_roundtrip(tmp_path):
    from art_sbir_tpu.ops.pq import build_ivf_pq, load_pq, save_pq

    rng = np.random.default_rng(16)
    g = rng.standard_normal((100, 16)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 4, iters=4, seed=0)
    cb, codes = build_ivf_pq(jnp.asarray(g), idx, 4, k_codes=16, iters=4,
                             opq_iters=2)
    save_pq(cb, codes, tmp_path / "pq.npz")
    cb2, codes2 = load_pq(tmp_path / "pq.npz")
    np.testing.assert_array_equal(np.asarray(cb.rotation),
                                  np.asarray(cb2.rotation))
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))
    q = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    v1, i1 = ivf_pq_search(q, idx, codes, cb, nprobe=2, k=5)
    v2, i2 = ivf_pq_search(q, idx, codes2, cb2, nprobe=2, k=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    # a rotation-free save has no rotation after reload
    save_pq(cb._replace(rotation=None), codes, tmp_path / "pq2.npz")
    cb3, _ = load_pq(tmp_path / "pq2.npz")
    assert cb3.rotation is None


def test_build_ivf_pq_chunked_build_matches_one_shot():
    """The chunk-streamed residual encode (the out-of-core build path)
    produces identical codes to a single-chunk build."""
    from art_sbir_tpu.ops.pq import build_ivf_pq

    rng = np.random.default_rng(9)
    g = rng.standard_normal((100, 16)).astype(np.float32)
    idx = build_ivf(jnp.asarray(g), 4, iters=5, seed=0)
    cb1, c1 = build_ivf_pq(jnp.asarray(g), idx, 4, k_codes=16, iters=5,
                           chunk=16384)
    cb2, c2 = build_ivf_pq(jnp.asarray(g), idx, 4, k_codes=16, iters=5,
                           chunk=16)
    np.testing.assert_array_equal(np.asarray(cb1.centroids),
                                  np.asarray(cb2.centroids))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_validation_errors():
    rng = np.random.default_rng(6)
    g = rng.standard_normal((64, 16)).astype(np.float32)
    with pytest.raises(ValueError, match="divisible"):
        train_pq(jnp.asarray(g), 5)
    with pytest.raises(ValueError, match="k_codes"):
        train_pq(jnp.asarray(g), 4, k_codes=300)
    with pytest.raises(ValueError, match="metric"):
        train_pq(jnp.asarray(g), 4, metric="dot")
    with pytest.raises(ValueError, match="rows to train"):
        train_pq(jnp.asarray(g[:8]), 4, k_codes=16)
    cb = train_pq(jnp.asarray(g), 4, k_codes=8, iters=3)
    with pytest.raises(ValueError, match="dim"):
        encode_pq(jnp.asarray(g[:, :8]), cb)
    idx = build_ivf(jnp.asarray(g), 4, iters=3)
    codes = encode_pq(jnp.asarray(g), cb)
    with pytest.raises(ValueError, match="nprobe"):
        ivf_pq_search(jnp.asarray(g[:2]), idx, codes, cb, nprobe=0)
    with pytest.raises(ValueError, match="rerank_factor"):
        ivf_pq_search(jnp.asarray(g[:2]), idx, codes, cb, nprobe=1,
                      rows=jnp.asarray(g), rerank_factor=0)
    cidx = build_ivf(jnp.asarray(g), 4, metric="cosine", iters=3)
    with pytest.raises(ValueError, match="metric"):
        ivf_pq_search(jnp.asarray(g[:2]), cidx, codes, cb, nprobe=1)


# ----------------------------------------------------------- sharded IVF-PQ

def _mesh8():
    import jax

    from art_sbir_tpu.parallel.mesh import MeshSpec

    return MeshSpec(data=len(jax.devices())).build()


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_sharded_full_probe_full_rerank_matches_exact_path(metric):
    """Sharded IVF-PQ with nprobe == nlist and a rerank budget covering
    every candidate: each shard scores all of its rows exactly, and the
    (value, global index) lexsort merge reproduces the exact path
    bit-for-bit — values, indices, and ascending-gallery-index ties."""
    from art_sbir_tpu.ops.ivf import build_ivf_sharded
    from art_sbir_tpu.ops.pq import build_ivf_pq_sharded, \
        ivf_pq_search_sharded

    mesh = _mesh8()
    s = mesh.devices.size
    rng = np.random.default_rng(21)
    g = rng.standard_normal((25 * s - 8, 32)).astype(np.float32)
    g = np.concatenate([g, g[:8]])  # duplicates (cross-shard) -> ties
    q = rng.standard_normal((16, 32)).astype(np.float32)
    sidx = build_ivf_sharded(jnp.asarray(g), s, 4, metric=metric, iters=5)
    cb, codes = build_ivf_pq_sharded(jnp.asarray(g), sidx, 8, k_codes=16,
                                     iters=5)
    assert cb.residual and cb.metric == metric
    assert codes.shape == (25 * s, 8) and codes.dtype == jnp.uint8
    vals, ids = ivf_pq_search_sharded(
        jnp.asarray(q), sidx, codes, cb, mesh, nprobe=sidx.nlist, k=7,
        rows=jnp.asarray(g), rerank_factor=1000)
    _, ev, ei = retrieve(jnp.asarray(q), jnp.asarray(g),
                         jnp.zeros(16, jnp.int32), k=7, metric=metric)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ei))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ev),
                               rtol=1e-5, atol=1e-5)


def test_sharded_pure_pq_self_retrieval_and_chunking():
    """Pure mode (rows dropped): shared codebook makes per-shard ADC
    values comparable, so self-retrieval lands on separated rows and
    host query-chunking is a no-op on results."""
    from art_sbir_tpu.ops.ivf import build_ivf_sharded
    from art_sbir_tpu.ops.pq import build_ivf_pq_sharded, \
        ivf_pq_search_sharded

    mesh = _mesh8()
    s = mesh.devices.size
    rng = np.random.default_rng(22)
    g = (10.0 * rng.standard_normal((16 * s, 16))).astype(np.float32)
    sidx = build_ivf_sharded(jnp.asarray(g), s, 4, iters=8)
    cb, codes = build_ivf_pq_sharded(jnp.asarray(g), sidx, 4, k_codes=64,
                                     iters=10)
    vals, ids = ivf_pq_search_sharded(jnp.asarray(g), sidx, codes, cb,
                                      mesh, nprobe=sidx.nlist, k=3)
    assert (np.asarray(ids)[:, 0] == np.arange(16 * s)).all()
    v = np.asarray(vals)
    assert np.isfinite(v[:, :1]).all() and (v[:, 0] >= 0).all()
    assert (v[:, 0] < 0.5 * v[:, 1]).all()

    cv, ci = ivf_pq_search_sharded(jnp.asarray(g), sidx, codes, cb, mesh,
                                   nprobe=sidx.nlist, k=3,
                                   row_budget_bytes=1 << 16)
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(ids))
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(vals))


def test_sharded_pq_validation_errors():
    from art_sbir_tpu.ops.ivf import build_ivf, build_ivf_sharded
    from art_sbir_tpu.ops.pq import build_ivf_pq_sharded, \
        ivf_pq_search_sharded

    mesh = _mesh8()
    s = mesh.devices.size
    rng = np.random.default_rng(23)
    g = rng.standard_normal((8 * s, 16)).astype(np.float32)
    sidx = build_ivf_sharded(jnp.asarray(g), s, 2, iters=3)
    cb, codes = build_ivf_pq_sharded(jnp.asarray(g), sidx, 4, k_codes=8,
                                     iters=3)
    flat = build_ivf(jnp.asarray(g), 2, iters=3)
    with pytest.raises(ValueError, match="ShardedIVF"):
        build_ivf_pq_sharded(jnp.asarray(g), flat, 4)
    with pytest.raises(ValueError, match="ShardedIVF"):
        ivf_pq_search_sharded(jnp.asarray(g[:2]), flat, codes, cb, mesh)
    with pytest.raises(ValueError, match="nprobe"):
        ivf_pq_search_sharded(jnp.asarray(g[:2]), sidx, codes, cb, mesh,
                              nprobe=0)
    with pytest.raises(ValueError, match="exceeds the per-shard"):
        ivf_pq_search_sharded(jnp.asarray(g[:2]), sidx, codes, cb, mesh,
                              nprobe=1, k=9)
    with pytest.raises(ValueError, match="codes rows"):
        ivf_pq_search_sharded(jnp.asarray(g[:2]), sidx, codes[:-1], cb,
                              mesh, nprobe=1)
    with pytest.raises(ValueError, match="shard like the codes"):
        ivf_pq_search_sharded(jnp.asarray(g[:2]), sidx, codes, cb, mesh,
                              nprobe=1, rows=jnp.asarray(g[:-1]))
    ccb = PQCodebook(cb.centroids, "cosine", True, None)
    with pytest.raises(ValueError, match="metric"):
        ivf_pq_search_sharded(jnp.asarray(g[:2]), sidx, codes, ccb, mesh,
                              nprobe=1)
