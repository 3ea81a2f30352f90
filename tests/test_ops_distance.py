"""Distance / ranking / top-k vs torch reference semantics."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn

from art_sbir_tpu.ops import distance as D


def test_euclidean_rowwise_matches_torch_pairwise(rng):
    a = rng.standard_normal((16, 64)).astype(np.float32)
    b = rng.standard_normal((16, 64)).astype(np.float32)
    ours = np.asarray(D.euclidean_distance(jnp.array(a), jnp.array(b)))
    ref = nn.PairwiseDistance(p=2)(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_cosine_rowwise_matches_torch(rng):
    a = rng.standard_normal((16, 64)).astype(np.float32)
    b = rng.standard_normal((16, 64)).astype(np.float32)
    ours = np.asarray(D.cosine_distance(jnp.array(a), jnp.array(b)))
    ref = (1 - nn.CosineSimilarity(dim=1)(torch.from_numpy(a), torch.from_numpy(b))).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_pairwise_l2_matches_broadcast_rowwise(rng):
    q = rng.standard_normal((5, 32)).astype(np.float32)
    g = rng.standard_normal((40, 32)).astype(np.float32)
    ours = np.asarray(D.pairwise_l2(jnp.array(q), jnp.array(g)))
    # the reference broadcasts one sketch against all gallery rows.
    # the expanded |q|^2+|g|^2-2qg MXU form carries ~1e-3 fp32 cancellation
    # noise vs the diff-based form; irrelevant at retrieval distances O(1-10).
    for i in range(5):
        ref = nn.PairwiseDistance(p=2)(
            torch.from_numpy(q[i : i + 1]), torch.from_numpy(g)
        ).numpy()
        np.testing.assert_allclose(ours[i], ref, rtol=3e-3, atol=3e-3)


def test_pairwise_cosine_matches_broadcast_rowwise(rng):
    q = rng.standard_normal((5, 32)).astype(np.float32)
    g = rng.standard_normal((40, 32)).astype(np.float32)
    ours = np.asarray(D.pairwise_cosine(jnp.array(q), jnp.array(g)))
    for i in range(5):
        ref = (
            1
            - nn.CosineSimilarity(dim=1)(
                torch.from_numpy(q[i : i + 1]), torch.from_numpy(g)
            )
        ).numpy()
        np.testing.assert_allclose(ours[i], ref, rtol=1e-4, atol=1e-5)


def test_rank_of_positive_matches_stable_full_sort(rng):
    q = rng.standard_normal((8, 16)).astype(np.float32)
    g = rng.standard_normal((30, 16)).astype(np.float32)
    pos = rng.integers(0, 30, size=8).astype(np.int32)
    dist = np.asarray(D.pairwise_l2(jnp.array(q), jnp.array(g)))
    ranks = np.asarray(D.rank_of_positive(jnp.array(dist), jnp.array(pos)))
    for i in range(8):
        order = np.argsort(dist[i], kind="stable")
        ref_rank = int(np.nonzero(order == pos[i])[0][0])
        assert ranks[i] == ref_rank


def test_rank_tie_breaking_by_index():
    # gallery rows 1 and 3 are identical; positive at 3 must rank AFTER 1
    dist = jnp.array([[0.5, 0.2, 0.9, 0.2, 0.1]])
    assert int(D.rank_of_positive(dist, jnp.array([3]))[0]) == 2
    assert int(D.rank_of_positive(dist, jnp.array([1]))[0]) == 1


def test_manufactured_ties_vs_torch_topk_recipe(rng):
    """Duplicated gallery rows create EXACT distance ties. The reference
    ranks via ``distances.topk(len(gallery), largest=False)`` (reference
    `inference.py:43-56`), whose tie order is ARBITRARY (quickselect —
    empirically neither index-stable nor reverse; see the docstring fix in
    `ops/distance.py`). Parity under ties is therefore defined up to tie
    equivalence: our rank must lie in the positive's tie block exactly like
    torch's, with strictly-closer counts identical, and the top-k must
    agree as value-grouped index sets."""
    d = 16
    base = rng.standard_normal((30, d)).astype(np.float32)
    gal = np.concatenate([base, base[:15], base[:8]])  # dup blocks -> ties
    n = len(gal)
    queries = base[[2, 5, 9, 14]] + 0.05 * rng.standard_normal((4, d)).astype(
        np.float32
    )
    # positives include duplicated rows (both the first and later copies)
    pos = np.array([2, 35, 9, 52], np.int32)  # 35 dups row 5, 52 dups row 7

    ranks, vals, idx = D.retrieve(
        jnp.array(queries), jnp.array(gal), jnp.array(pos), k=10
    )
    pd = nn.PairwiseDistance(p=2)
    for i in range(4):
        distances = pd(torch.from_numpy(queries[i : i + 1]),
                       torch.from_numpy(gal))
        dnp = distances.numpy()
        _, order = distances.topk(n, largest=False)
        ref_rank = int((order == int(pos[i])).nonzero()[0, 0])
        our_rank = int(np.asarray(ranks)[i])

        # identical strictly-closer count; both ranks inside the tie block
        d_pos = dnp[pos[i]]
        strictly = int((dnp < d_pos).sum())
        tie_block = int((dnp == d_pos).sum())  # includes the positive itself
        assert strictly <= our_rank < strictly + tie_block
        assert strictly <= ref_rank < strictly + tie_block
        # ours is the deterministic stable-sort rank
        stable = np.argsort(dnp, kind="stable")
        assert our_rank == int(np.nonzero(stable == pos[i])[0][0])

        # top-10 values agree to the expanded-MXU-form tolerance (see
        # test_pairwise_l2_matches_broadcast_rowwise for the 3e-3 rationale)
        np.testing.assert_allclose(
            np.asarray(vals)[i], np.sort(dnp)[:10], rtol=3e-3, atol=3e-3
        )
        # same index membership per tie group, ascending (each path groups
        # by ITS OWN computed values — exact duplicates tie exactly in both)
        ref10 = order[:10].numpy()
        ours10 = np.asarray(idx)[i]
        our_vals10 = np.asarray(vals)[i]

        def groups(indices, values):
            out, cur, cv = [], [], None
            for ix, v in zip(indices.tolist(), values.tolist()):
                if cv is None or v != cv:
                    if cur:
                        out.append(set(cur))
                    cur, cv = [ix], v
                else:
                    cur.append(ix)
            out.append(set(cur))
            return out

        og = groups(ours10, our_vals10)
        rg = groups(ref10, dnp[ref10])
        assert len(og) == len(rg)
        for ours_v, ref_v in zip(og, rg):
            full_v = set(np.nonzero(dnp == dnp[next(iter(ref_v))])[0].tolist())
            if len(ref_v) == len(full_v) and len(ours_v) == len(full_v):
                assert ours_v == ref_v == full_v
            else:  # tie group truncated by the k boundary
                assert ours_v <= full_v and ref_v <= full_v


def test_top_k_ascending(rng):
    dist = rng.random((4, 50)).astype(np.float32)
    vals, idx = D.top_k(jnp.array(dist), 10)
    vals, idx = np.asarray(vals), np.asarray(idx)
    for i in range(4):
        ref_idx = np.argsort(dist[i])[:10]
        np.testing.assert_allclose(vals[i], np.sort(dist[i])[:10], rtol=1e-6)
        np.testing.assert_array_equal(np.sort(idx[i]), np.sort(ref_idx))


def test_retrieve_end_to_end_tiny_gallery(rng):
    # hand-checkable: queries equal to gallery rows -> rank 0, top1 = self
    g = rng.standard_normal((20, 8)).astype(np.float32)
    q = g[[3, 7, 11]]
    ranks, vals, idx = D.retrieve(
        jnp.array(q), jnp.array(g), jnp.array([3, 7, 11]), k=5
    )
    assert list(np.asarray(ranks)) == [0, 0, 0]
    assert list(np.asarray(idx)[:, 0]) == [3, 7, 11]


def test_retrieve_with_padded_gallery(rng):
    g = rng.standard_normal((20, 8)).astype(np.float32)
    pad = np.zeros((12, 8), np.float32)  # padded rows must never win
    gp = np.concatenate([g, pad])
    valid = np.arange(32) < 20
    q = g[[0, 5]]
    ranks, vals, idx = D.retrieve(
        jnp.array(q), jnp.array(gp), jnp.array([0, 5]), k=5, valid=jnp.array(valid)
    )
    assert list(np.asarray(ranks)) == [0, 0]
    assert np.all(np.asarray(idx) < 20)
