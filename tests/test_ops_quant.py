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
