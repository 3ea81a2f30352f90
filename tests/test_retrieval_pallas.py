"""Fused Pallas retrieval kernel vs the XLA reference (interpret mode on the
CPU mesh; the compiled path is exercised on real TPU by bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from art_sbir_tpu.ops.distance import retrieve
from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused


@pytest.mark.parametrize(
    "n,q,tile_q,tile_n",
    [(300, 8, 8, 128), (128, 4, 8, 128), (1000, 16, 8, 256), (517, 37, 16, 128)],
)
def test_fused_matches_xla_reference(rng, n, q, tile_q, tile_n):
    d = 64
    gal = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    pos = rng.integers(0, n, size=q).astype(np.int32)

    r0, v0, i0 = retrieve(jnp.array(queries), jnp.array(gal), jnp.array(pos), k=10)
    r1, v1, i1 = retrieve_fused(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), k=10,
        tile_q=tile_q, tile_n=tile_n, interpret=True,
    )
    # both paths fold torch's 1e-6 PairwiseDistance eps (expanded form), so
    # indices, ranks and tie-breaks agree; values differ only by sqrt
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(
        np.asarray(v0) ** 2, np.asarray(v1), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


def test_fused_query_tiling_consistent(rng):
    """Different query tilings of the same problem return identical results
    (state is per-query-block; tiling must not change any output)."""
    n, q, d = 400, 24, 32
    gal = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    pos = rng.integers(0, n, size=q).astype(np.int32)
    outs = [
        retrieve_fused(jnp.array(queries), jnp.array(gal), jnp.array(pos),
                       k=7, tile_q=tq, tile_n=128, interpret=True)
        for tq in (8, 16, 24)
    ]
    for r, v, i in outs[1:]:
        np.testing.assert_array_equal(np.asarray(outs[0][0]), np.asarray(r))
        np.testing.assert_array_equal(np.asarray(outs[0][2]), np.asarray(i))
        np.testing.assert_allclose(np.asarray(outs[0][1]), np.asarray(v),
                                   rtol=1e-6, atol=1e-6)


def test_fused_manufactured_ties(rng):
    """Duplicated gallery rows create exact distance ties; the fused kernel
    must order them by gallery index like the XLA path's stable sort."""
    d = 16
    base = rng.standard_normal((40, d)).astype(np.float32)
    # rows 0..39, then exact duplicates of rows 0..19 at indices 40..59
    gal = np.concatenate([base, base[:20]], axis=0)
    queries = base[[3, 7, 11]] + 0.01 * rng.standard_normal((3, d)).astype(np.float32)
    pos = np.array([3, 7, 51], np.int32)  # 51 duplicates row 11

    r0, v0, i0 = retrieve(jnp.array(queries), jnp.array(gal), jnp.array(pos), k=10)
    r1, v1, i1 = retrieve_fused(jnp.array(queries), jnp.array(gal),
                                jnp.array(pos), k=10, tile_q=8, tile_n=128,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


def test_fused_rejects_k_above_gallery(rng):
    """k > N would leave sentinel-filled top-k slots that fail every row's
    certificate (ADVICE r2): the entry points reject it loudly instead."""
    gal = rng.standard_normal((8, 16)).astype(np.float32)
    q = gal[:2]
    pos = np.arange(2, dtype=np.int32)
    with pytest.raises(ValueError, match="exceeds gallery size"):
        retrieve_fused(jnp.array(q), jnp.array(gal), jnp.array(pos), k=16,
                       interpret=True)


def test_fused_self_retrieval(rng):
    gal = rng.standard_normal((256, 32)).astype(np.float32)
    q = gal[[5, 100, 200]]
    pos = np.array([5, 100, 200], np.int32)
    r, v, i = retrieve_fused(jnp.array(q), jnp.array(gal), jnp.array(pos),
                             k=5, interpret=True)
    assert list(np.asarray(r)) == [0, 0, 0]
    assert list(np.asarray(i)[:, 0]) == [5, 100, 200]
    np.testing.assert_allclose(np.asarray(v)[:, 0], 0.0, atol=1e-5)


@pytest.mark.parametrize("n,q", [(300, 16), (517, 24)])
def test_fused_cosine_matches_xla(rng, n, q):
    """metric='cosine' reproduces the XLA path's 1 - cos_sim retrieval
    (torch CosineSimilarity clamp semantics, ops/distance.py:88-98):
    identical ranks and indices, values to MXU-form tolerance."""
    d = 64
    gal = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    pos = rng.integers(0, n, size=q).astype(np.int32)

    r0, v0, i0 = retrieve(jnp.array(queries), jnp.array(gal), jnp.array(pos),
                          k=10, metric="cosine")
    r1, v1, i1 = retrieve_fused(jnp.array(queries), jnp.array(gal),
                                jnp.array(pos), k=10, tile_q=8, tile_n=128,
                                interpret=True, metric="cosine")
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               rtol=1e-5, atol=1e-6)


def test_fused_cosine_self_retrieval(rng):
    gal = rng.standard_normal((256, 32)).astype(np.float32)
    q = gal[[5, 100, 200]]
    p = np.array([5, 100, 200], np.int32)
    r, v, i = retrieve_fused(jnp.array(q), jnp.array(gal), jnp.array(p),
                             k=5, tile_q=8, tile_n=128, interpret=True,
                             metric="cosine")
    np.testing.assert_array_equal(np.asarray(r), 0)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], p)


def _mesh8():
    import jax
    from art_sbir_tpu.parallel.mesh import MeshSpec

    return MeshSpec(data=len(jax.devices())).build()


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_fused_sharded_matches_global(rng, metric):
    """Gallery row-sharded over the 8-device mesh: per-shard fused sweeps
    + O(Q*k) candidate merge must equal the single-device XLA retrieval
    exactly (ranks, indices; values per metric contract)."""
    from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused_sharded

    n, q, d = 1024, 24, 32  # 128 rows/shard on the 8-device mesh
    gal = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    pos = rng.integers(0, n, size=q).astype(np.int32)

    r0, v0, i0 = retrieve(jnp.array(queries), jnp.array(gal),
                          jnp.array(pos), k=10, metric=metric)
    r1, v1, i1 = retrieve_fused_sharded(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), _mesh8(),
        k=10, tile_q=8, tile_n=128, interpret=True, metric=metric)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    want = np.asarray(v0) ** 2 if metric == "euclidean" else np.asarray(v0)
    np.testing.assert_allclose(want, np.asarray(v1), rtol=2e-3, atol=2e-3)


def test_fused_sharded_cross_shard_ties(rng):
    """Duplicated rows placed in DIFFERENT shards tie exactly; the merge
    must keep the smallest global index first and ranks must count ties
    across shard boundaries like the stable global order."""
    from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused_sharded

    d = 16
    base = rng.standard_normal((128, d)).astype(np.float32)
    gal = np.concatenate([base] * 8)  # every shard is a duplicate block
    queries = base[[3, 50, 99]] + 0.01 * rng.standard_normal(
        (3, d)).astype(np.float32)
    pos = np.array([3, 128 + 50, 7 * 128 + 99], np.int32)  # across shards

    r0, v0, i0 = retrieve(jnp.array(queries), jnp.array(gal),
                          jnp.array(pos), k=10)
    r1, v1, i1 = retrieve_fused_sharded(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), _mesh8(),
        k=10, tile_q=8, tile_n=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_fused_sharded_rejects_ragged_gallery(rng):
    from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused_sharded

    gal = rng.standard_normal((1003, 16)).astype(np.float32)  # 1003 % 8 != 0
    with pytest.raises(ValueError, match="divisible by"):
        retrieve_fused_sharded(
            jnp.zeros((4, 16)), jnp.array(gal),
            jnp.zeros((4,), jnp.int32), _mesh8(), interpret=True)


def test_certificate_detects_lane_overflow(rng):
    """Adversarial layout: a query's 8 nearest rows all share one VPU lane
    (indices congruent mod 128), overflowing the per-lane top-4 file. The
    in-kernel certificate must flag those rows and the public wrapper's
    XLA fallback must return the exact global result anyway."""
    from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused_core

    d = 32
    n = 1024
    gal = rng.standard_normal((n, d)).astype(np.float32) * 10.0
    target = rng.standard_normal(d).astype(np.float32)
    # plant 8 near-duplicates of the target in lane 5 (indices 5, 133, ...)
    lane_idx = [5 + 128 * j for j in range(8)]
    for rank_i, gi in enumerate(lane_idx):
        gal[gi] = target + 1e-3 * (rank_i + 1)
    queries = np.stack([target, rng.standard_normal(d).astype(np.float32)])
    pos = np.array([lane_idx[0], 0], np.int32)

    r, v, i, exact = retrieve_fused_core(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), k=8,
        tile_q=8, tile_n=1024, interpret=True)
    assert int(np.asarray(exact)[0]) == 0, "lane overflow must be flagged"

    r1, v1, i1 = retrieve_fused(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), k=8,
        tile_q=8, tile_n=1024, interpret=True)
    r0, v0, i0 = retrieve(jnp.array(queries), jnp.array(gal),
                          jnp.array(pos), k=8)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    # the planted near-duplicates are the true top-8 of query 0
    assert list(np.asarray(i1)[0]) == lane_idx


def test_fused_sharded_k_guard_uses_shard_size(rng):
    """k must be bounded by the PER-SHARD row count (N / devices), not the
    global N: each shard's kernel extracts top-k from its own rows only."""
    from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused_sharded

    n, q, d = 1024, 8, 32  # 128 rows/shard on the 8-device mesh
    gal = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    pos = rng.integers(0, n, size=q).astype(np.int32)

    with pytest.raises(ValueError, match="per-shard"):
        retrieve_fused_sharded(
            jnp.array(queries), jnp.array(gal), jnp.array(pos), _mesh8(),
            k=200, tile_q=8, tile_n=128, interpret=True)  # 200 > 128


@pytest.mark.parametrize("seg_reduce", [2, 4])
def test_fused_seg_reduce_parity(rng, seg_reduce):
    """The segment fold (pre-insert per-lane min over seg_reduce segments)
    must keep full parity with the XLA reference — fold-collision rows are
    certified and recomputed, everything else is bit-identical."""
    n, d, q = 700, 48, 21
    gal = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    pos = rng.integers(0, n, size=q).astype(np.int32)

    r0, v0, i0 = retrieve(jnp.array(queries), jnp.array(gal),
                          jnp.array(pos), k=9)
    r1, v1, i1 = retrieve_fused(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), k=9,
        tile_q=8, tile_n=256, interpret=True, seg_reduce=seg_reduce)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_allclose(np.asarray(v0) ** 2, np.asarray(v1),
                               rtol=2e-3, atol=2e-3)


def test_fused_fold_collision_certificate(rng):
    """Two of the true top-k in the same (lane, fold bucket) — rows 5 and
    133 with tile_n=256/seg_reduce=2 — force a fold drop; the certificate
    must flag the row and the fallback restore exactness. Rank-of-positive
    is per-column (unfolded) and must be exact straight from the kernel."""
    from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused_core

    n, d = 512, 32
    gal = rng.standard_normal((n, d)).astype(np.float32) * 10.0
    target = rng.standard_normal(d).astype(np.float32)
    gal[5] = target + 0.01
    gal[133] = target - 0.01  # lane 5, adjacent segment: same fold bucket
    queries = target[None, :]
    pos = np.array([5], np.int32)

    r, v, i, exact = retrieve_fused_core(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), k=4,
        tile_q=8, tile_n=256, interpret=True, seg_reduce=2)
    assert int(np.asarray(exact)[0]) == 0, "fold collision must be flagged"
    r0, v0, i0 = retrieve(jnp.array(queries), jnp.array(gal),
                          jnp.array(pos), k=4)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r))

    r1, v1, i1 = retrieve_fused(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), k=4,
        tile_q=8, tile_n=256, interpret=True, seg_reduce=2)
    assert {5, 133} <= set(np.asarray(i1)[0].tolist())
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))

    # device_get mode: numpy outputs, one combined transfer, host-side
    # fallback merge — identical results through the flagged row
    r2, v2, i2 = retrieve_fused(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), k=4,
        tile_q=8, tile_n=256, interpret=True, seg_reduce=2,
        device_get=True)
    assert isinstance(v2, np.ndarray) and isinstance(i2, np.ndarray)
    np.testing.assert_array_equal(np.asarray(i0), i2)
    np.testing.assert_array_equal(np.asarray(r0), r2)
    np.testing.assert_allclose(np.asarray(v1), v2, rtol=1e-6)

    # the serving configuration: with_ranks=False + device_get through
    # the SAME flagged row (skips the rb pull, keeps zero ranks)
    r3, v3, i3 = retrieve_fused(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), k=4,
        tile_q=8, tile_n=256, interpret=True, seg_reduce=2,
        device_get=True, with_ranks=False)
    assert isinstance(v3, np.ndarray) and isinstance(i3, np.ndarray)
    np.testing.assert_array_equal(np.asarray(i0), i3)
    np.testing.assert_array_equal(np.zeros_like(r3), r3)
    np.testing.assert_allclose(np.asarray(v1), v3, rtol=1e-6)


def test_fused_without_ranks(rng):
    """with_ranks=False (the serving path) must return the same top-k and
    zero ranks — including for certificate-fallback rows."""
    n, d, q = 520, 32, 12
    gal = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    pos = np.zeros(q, np.int32)

    _, v0, i0 = retrieve_fused(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), k=7,
        tile_q=8, tile_n=256, interpret=True)
    r1, v1, i1 = retrieve_fused(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), k=7,
        tile_q=8, tile_n=256, interpret=True, with_ranks=False)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    assert not np.asarray(r1).any()
