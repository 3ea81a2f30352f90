"""Fused Pallas retrieval kernel vs the XLA reference (interpret mode on the
CPU mesh; the compiled path is exercised on real TPU by bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from art_sbir_tpu.ops.distance import retrieve
from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused


@pytest.mark.parametrize("n,q,tile", [(300, 8, 128), (128, 4, 128), (1000, 16, 256)])
def test_fused_matches_xla_reference(rng, n, q, tile):
    d = 64
    gal = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    pos = rng.integers(0, n, size=q).astype(np.int32)

    r0, v0, i0 = retrieve(jnp.array(queries), jnp.array(gal), jnp.array(pos), k=10)
    r1, v1, i1 = retrieve_fused(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), k=10, tile_n=tile,
        interpret=True,
    )
    # the fused kernel computes without the reference's 1e-6 distance eps;
    # ranks can differ only on exact float ties of unrelated rows
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(
        np.asarray(v0) ** 2, np.asarray(v1), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


def test_fused_self_retrieval(rng):
    gal = rng.standard_normal((256, 32)).astype(np.float32)
    q = gal[[5, 100, 200]]
    pos = np.array([5, 100, 200], np.int32)
    r, v, i = retrieve_fused(jnp.array(q), jnp.array(gal), jnp.array(pos),
                             k=5, interpret=True)
    assert list(np.asarray(r)) == [0, 0, 0]
    assert list(np.asarray(i)[:, 0]) == [5, 100, 200]
    np.testing.assert_allclose(np.asarray(v)[:, 0], 0.0, atol=1e-5)
