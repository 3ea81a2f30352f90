"""Int8-quantized retrieval: exactness on separated data, near-perfect
top-k overlap on adversarially flat random data, torch-parity values.
No reference counterpart (beyond-reference scale feature, ops/quant.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from art_sbir_tpu.ops.distance import retrieve
from art_sbir_tpu.ops.quant import (
    QuantGallery,
    quantize_gallery,
    retrieve_quantized,
    topk_overlap,
)


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_quantized_exact_on_separated_data(rng, metric):
    """Queries are perturbed gallery rows: the true neighbors are well
    separated, so int8 candidates + exact rerank must reproduce the
    exact path's indices AND values."""
    n, d, q, k = 512, 128, 32, 10
    gal = rng.standard_normal((n, d)).astype(np.float32)
    qs = gal[:q] + 0.05 * rng.standard_normal((q, d)).astype(np.float32)
    pos = np.arange(q, dtype=np.int32)

    _, v0, i0 = retrieve(jnp.asarray(qs), jnp.asarray(gal),
                         jnp.asarray(pos), k=k, metric=metric)
    qg = quantize_gallery(jnp.asarray(gal), metric=metric)
    v1, i1 = retrieve_quantized(jnp.asarray(qs), qg, jnp.asarray(gal), k=k)

    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # values: the rerank computes the row-wise form, the exact path the
    # expanded matmul form — same contract, ~1e-5 fp difference
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_quantized_overlap_on_flat_random_data(rng, metric):
    """Uniform random gallery = the hardest case (neighbor gaps are
    tiny); the rerank margin must still keep top-k overlap ~1."""
    n, d, q, k = 2048, 256, 64, 10
    gal = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((q, d)).astype(np.float32)
    pos = np.zeros(q, np.int32)

    _, _, i0 = retrieve(jnp.asarray(qs), jnp.asarray(gal),
                        jnp.asarray(pos), k=k, metric=metric)
    qg = quantize_gallery(jnp.asarray(gal), metric=metric)
    _, i1 = retrieve_quantized(jnp.asarray(qs), qg, jnp.asarray(gal), k=k)
    ov = topk_overlap(i0, i1)
    assert ov >= 0.97, ov


def test_quantize_gallery_rejects_unknown_metric(rng):
    with pytest.raises(ValueError, match="unknown metric"):
        quantize_gallery(jnp.zeros((4, 8)), metric="l2")


def test_quantized_k_clamps_and_shapes(rng):
    gal = rng.standard_normal((8, 16)).astype(np.float32)
    qg = quantize_gallery(jnp.asarray(gal))
    v, i = retrieve_quantized(jnp.asarray(gal[:3]), qg, jnp.asarray(gal),
                              k=50)
    assert v.shape == (3, 8) and i.shape == (3, 8)
    assert (np.asarray(i)[:, 0] == np.arange(3)).all()  # self-retrieval


def test_quant_gallery_structure(rng):
    gal = rng.standard_normal((16, 32)).astype(np.float32)
    qg = quantize_gallery(jnp.asarray(gal))
    assert isinstance(qg, QuantGallery)
    assert qg.q8.dtype == jnp.int8 and qg.q8.shape == (16, 32)
    # int8 gallery is 4x smaller than f32
    assert qg.q8.nbytes * 4 == gal.nbytes
    # dequantized rows are within one quantization step of the original
    deq = np.asarray(qg.q8, np.float32) * np.asarray(qg.scale)[:, None]
    step = np.asarray(qg.scale)[:, None]
    assert (np.abs(deq - gal) <= step / 2 + 1e-7).all()


def test_topk_overlap_metric():
    a = np.array([[1, 2, 3], [4, 5, 6]])
    b = np.array([[1, 2, 9], [7, 8, 9]])
    assert topk_overlap(a, b) == pytest.approx((2 / 3 + 0) / 2)


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_quantized_fused_matches_xla_scan(rng, metric):
    """The Pallas int8 streaming scan replicates the XLA scan's f32 op
    order, so on separated data (certificate passes) the final indices
    are identical and values agree to fp noise."""
    from art_sbir_tpu.ops.quant import retrieve_quantized_fused

    n, d, q, k = 1024, 128, 48, 10
    gal = rng.standard_normal((n, d)).astype(np.float32)
    qs = gal[:q] + 0.05 * rng.standard_normal((q, d)).astype(np.float32)
    qg = quantize_gallery(jnp.asarray(gal), metric=metric)
    v0, i0 = retrieve_quantized(jnp.asarray(qs), qg, jnp.asarray(gal), k=k)
    v1, i1 = retrieve_quantized_fused(jnp.asarray(qs), qg,
                                      jnp.asarray(gal), k=k)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_quantized_fused_ragged_edges(rng, metric):
    """Gallery not a multiple of 128 and queries not a multiple of 8:
    the kernel's in-tile masking must keep parity with the XLA scan."""
    from art_sbir_tpu.ops.quant import retrieve_quantized_fused

    n, d, q, k = 300, 64, 13, 7
    gal = rng.standard_normal((n, d)).astype(np.float32)
    qs = gal[5:5 + q] + 0.03 * rng.standard_normal((q, d)).astype(
        np.float32)
    qg = quantize_gallery(jnp.asarray(gal), metric=metric)
    v0, i0 = retrieve_quantized(jnp.asarray(qs), qg, jnp.asarray(gal), k=k)
    v1, i1 = retrieve_quantized_fused(jnp.asarray(qs), qg,
                                      jnp.asarray(gal), k=k)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)


def test_quantized_fused_certificate_fallback(rng):
    """depth=1 per-lane files overflow on r=80 candidates (>1 of ~80 in a
    lane is near-certain), so the certificate must flag rows and the
    fallback must restore exact XLA-scan results."""
    from art_sbir_tpu.ops.quant import retrieve_quantized_fused
    from art_sbir_tpu.ops.retrieval_pallas import quant_candidates_fused
    from art_sbir_tpu.ops.quant import _symmetric_quantize

    n, d, q, k = 512, 64, 16, 10
    gal = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((q, d)).astype(np.float32)
    qg = quantize_gallery(jnp.asarray(gal))

    # the certificate itself must fail at depth=1
    q8, s_q = _symmetric_quantize(jnp.asarray(qs))
    _, _, cert = quant_candidates_fused(q8, s_q, qg.q8, qg.scale,
                                        qg.sq_norm, r=80, depth=1)
    assert not np.asarray(cert).all()

    v0, i0 = retrieve_quantized(jnp.asarray(qs), qg, jnp.asarray(gal), k=k)
    v1, i1 = retrieve_quantized_fused(jnp.asarray(qs), qg,
                                      jnp.asarray(gal), k=k, depth=1)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)

    # device_get mode (one combined transfer + host merge): numpy outputs,
    # same results through the forced-fallback branch
    v2, i2 = retrieve_quantized_fused(jnp.asarray(qs), qg,
                                      jnp.asarray(gal), k=k, depth=1,
                                      device_get=True)
    assert isinstance(v2, np.ndarray) and isinstance(i2, np.ndarray)
    np.testing.assert_array_equal(np.asarray(i0), i2)
    np.testing.assert_allclose(np.asarray(v0), v2, rtol=1e-6)

    # and through the no-fallback fast path (default depth)
    v3, i3 = retrieve_quantized_fused(jnp.asarray(qs), qg,
                                      jnp.asarray(gal), k=k,
                                      device_get=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i3))


@pytest.mark.parametrize("seg_reduce", [1, 2, 4])
def test_quantized_fused_seg_reduce_parity(rng, seg_reduce):
    """The segment fold changes only WHERE candidates are dropped; with
    the certificate+fallback contract every fold width must reproduce
    the XLA scan exactly (ragged gallery exercises padded-lane folds)."""
    from art_sbir_tpu.ops.quant import retrieve_quantized_fused

    n, d, q, k = 700, 64, 11, 6
    gal = rng.standard_normal((n, d)).astype(np.float32)
    qs = gal[9:9 + q] + 0.04 * rng.standard_normal((q, d)).astype(
        np.float32)
    qg = quantize_gallery(jnp.asarray(gal))
    v0, i0 = retrieve_quantized(jnp.asarray(qs), qg, jnp.asarray(gal), k=k)
    v1, i1 = retrieve_quantized_fused(jnp.asarray(qs), qg,
                                      jnp.asarray(gal), k=k,
                                      seg_reduce=seg_reduce)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)


def test_quantized_fused_fold_collision_certificate(rng):
    """Two top-r rows in the same (lane, fold bucket) — rows j and j+128
    with seg_reduce=2 — force the fold to drop one; the certificate must
    flag the row and the fallback must restore XLA-scan exactness."""
    from art_sbir_tpu.ops.quant import _symmetric_quantize
    from art_sbir_tpu.ops.quant import retrieve_quantized_fused
    from art_sbir_tpu.ops.retrieval_pallas import quant_candidates_fused

    n, d = 256, 32
    gal = rng.standard_normal((n, d)).astype(np.float32) * 10.0
    target = rng.standard_normal(d).astype(np.float32)
    gal[5] = target + 0.01
    gal[133] = target - 0.01  # lane 5, segment 1 -> same fold bucket
    qs = target[None, :]
    qg = quantize_gallery(jnp.asarray(gal))

    q8, s_q = _symmetric_quantize(jnp.asarray(qs))
    _, cand, cert = quant_candidates_fused(
        q8, s_q, qg.q8, qg.scale, qg.sq_norm, r=4, tile_n=256,
        seg_reduce=2)
    assert int(np.asarray(cert)[0]) == 0  # collision detected

    v0, i0 = retrieve_quantized(jnp.asarray(qs), qg, jnp.asarray(gal),
                                k=3, rerank_factor=2)
    v1, i1 = retrieve_quantized_fused(jnp.asarray(qs), qg,
                                      jnp.asarray(gal), k=3,
                                      rerank_factor=2, tile_n=256,
                                      seg_reduce=2)
    assert {5, 133} <= set(np.asarray(i1)[0].tolist())
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)


def test_quant_candidates_fused_guards(rng):
    from art_sbir_tpu.ops.quant import _symmetric_quantize
    from art_sbir_tpu.ops.retrieval_pallas import quant_candidates_fused

    gal = rng.standard_normal((64, 32)).astype(np.float32)
    qg = quantize_gallery(jnp.asarray(gal))
    q8, s_q = _symmetric_quantize(jnp.asarray(gal[:4]))
    with pytest.raises(ValueError, match="exceeds gallery size"):
        quant_candidates_fused(q8, s_q, qg.q8, qg.scale, qg.sq_norm, r=65)
    with pytest.raises(ValueError, match="per-lane file capacity"):
        quant_candidates_fused(q8, s_q, qg.q8, qg.scale, qg.sq_norm,
                               r=64, depth=0)
    with pytest.raises(ValueError, match="unknown metric"):
        quant_candidates_fused(q8, s_q, qg.q8, qg.scale, qg.sq_norm,
                               r=8, metric="l2")
    with pytest.raises(ValueError, match="seg_reduce"):
        quant_candidates_fused(q8, s_q, qg.q8, qg.scale, qg.sq_norm,
                               r=8, seg_reduce=0)


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_quantized_chunked_matches_unchunked(rng, metric):
    from art_sbir_tpu.ops.quant import retrieve_quantized_chunked

    n, d, q, k = 256, 64, 40, 5
    gal = rng.standard_normal((n, d)).astype(np.float32)
    qs = gal[:q] + 0.05 * rng.standard_normal((q, d)).astype(np.float32)
    qg = quantize_gallery(jnp.asarray(gal), metric=metric)
    v0, i0 = retrieve_quantized(jnp.asarray(qs), qg, jnp.asarray(gal), k=k)
    v1, i1 = retrieve_quantized_chunked(jnp.asarray(qs), qg,
                                        jnp.asarray(gal), k=k, chunk=16)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)

    ve, ie = retrieve_quantized_chunked(jnp.asarray(qs[:0]), qg,
                                        jnp.asarray(gal), k=k)
    assert ve.shape == (0, k) and ie.shape == (0, k)


def _mesh8():
    import jax
    from art_sbir_tpu.parallel.mesh import MeshSpec

    return MeshSpec(data=len(jax.devices())).build()


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_quantized_sharded_matches_single_device(rng, metric):
    """On separated data (every candidate set contains the true top-k)
    the sharded superset contract coincides with the single-device
    result exactly."""
    from art_sbir_tpu.ops.quant import retrieve_quantized_sharded

    n, d, q, k = 1024, 64, 24, 5  # 128 rows/shard on the 8-device mesh
    gal = rng.standard_normal((n, d)).astype(np.float32)
    qs = gal[11:11 + q] + 0.03 * rng.standard_normal((q, d)).astype(
        np.float32)
    qg = quantize_gallery(jnp.asarray(gal), metric=metric)
    v0, i0 = retrieve_quantized(jnp.asarray(qs), qg, jnp.asarray(gal),
                                k=k, rerank_factor=4)
    v1, i1 = retrieve_quantized_sharded(jnp.asarray(qs), qg,
                                        jnp.asarray(gal), _mesh8(), k=k,
                                        rerank_factor=4)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-5)


def test_quantized_sharded_matches_pershard_oracle(rng):
    """On flat random data the contract is exactly 'per-shard approx
    top-r + local exact rerank + (value, index) merge' — checked against
    a plain-numpy oracle of that recipe."""
    from art_sbir_tpu.ops.distance import euclidean_distance
    from art_sbir_tpu.ops.quant import (_symmetric_quantize,
                                        retrieve_quantized_sharded)

    n, d, q, k, rf = 1024, 32, 16, 4, 3
    n_dev = 8
    n_loc = n // n_dev
    r = rf * k
    gal = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((q, d)).astype(np.float32)
    qg = quantize_gallery(jnp.asarray(gal))

    v1, i1 = retrieve_quantized_sharded(jnp.asarray(qs), qg,
                                        jnp.asarray(gal), _mesh8(), k=k,
                                        rerank_factor=rf)

    # oracle: same quantized math, shard-local candidates, exact merge
    q8, s_q = _symmetric_quantize(jnp.asarray(qs))
    dot = (np.asarray(q8, np.float32) @ np.asarray(qg.q8, np.float32).T
           * np.asarray(s_q)[:, None] * np.asarray(qg.scale)[None, :])
    approx = np.asarray(qg.sq_norm)[None, :] - 2.0 * dot
    cands = []
    for s in range(n_dev):
        blk = approx[:, s * n_loc:(s + 1) * n_loc]
        top = np.argsort(blk, axis=1, kind="stable")[:, :r] + s * n_loc
        cands.append(top)
    cand = np.concatenate(cands, axis=1)  # (q, n_dev*r) global indices
    exact = np.asarray(euclidean_distance(
        jnp.asarray(qs)[:, None, :], jnp.asarray(gal)[cand]))
    best_v, best_i = [], []
    for row in range(q):
        order = np.lexsort((cand[row], exact[row]))[:k]
        best_v.append(exact[row][order])
        best_i.append(cand[row][order])
    np.testing.assert_array_equal(np.asarray(i1), np.stack(best_i))
    np.testing.assert_allclose(np.asarray(v1), np.stack(best_v),
                               rtol=1e-5)


def test_quantized_sharded_kernel_route_matches_xla(rng):
    """use_kernel=True (streamed per-shard scan, interpret on CPU) must
    reproduce the XLA per-shard route exactly via certificate+fallback."""
    from art_sbir_tpu.ops.quant import retrieve_quantized_sharded

    n, d, q, k = 1024, 32, 12, 4
    gal = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((q, d)).astype(np.float32)
    qg = quantize_gallery(jnp.asarray(gal))
    v0, i0 = retrieve_quantized_sharded(jnp.asarray(qs), qg,
                                        jnp.asarray(gal), _mesh8(), k=k,
                                        use_kernel=False)
    v1, i1 = retrieve_quantized_sharded(jnp.asarray(qs), qg,
                                        jnp.asarray(gal), _mesh8(), k=k,
                                        use_kernel=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)


def test_quantized_sharded_guards(rng):
    from art_sbir_tpu.ops.quant import retrieve_quantized_sharded

    gal = rng.standard_normal((1024, 32)).astype(np.float32)
    qg = quantize_gallery(jnp.asarray(gal))
    qs = jnp.asarray(gal[:4])
    with pytest.raises(ValueError, match="divisible by"):
        retrieve_quantized_sharded(
            qs, quantize_gallery(jnp.asarray(gal[:1020])),
            jnp.asarray(gal[:1020]), _mesh8(), k=4)
    with pytest.raises(ValueError, match="per-shard gallery size"):
        retrieve_quantized_sharded(qs, qg, jnp.asarray(gal), _mesh8(),
                                   k=200)
