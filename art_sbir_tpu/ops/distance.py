"""Distances, ranking, and top-k retrieval — the retrieval engine's core.

Reference semantics being matched (see reference `utils.py:31-42`,
`inference.py:30-69`):

* ``euclidean``: ``torch.nn.PairwiseDistance(p=2)`` which computes
  ``||a - b + eps||_2`` with ``eps=1e-6`` folded into the *difference*.
* ``cosine``: ``1 - cosine_similarity`` (range [0, 2]), denominators clamped
  at ``eps=1e-8`` per torch's CosineSimilarity.
* rank of the positive: the reference full-sorts all N distances per query
  (``distances.topk(len(gallery))``, reference `inference.py:49`) and finds
  the position of the positive index. Equivalent — and O(N) instead of
  O(N log N) — is counting gallery items strictly closer than the positive.
  Under EXACT float ties torch's topk order is arbitrary (quickselect;
  empirically neither index-stable nor documented), so tie parity is only
  defined up to the tie block; this framework deterministically breaks
  ties by gallery index (stable-sort order), which always lands in the
  same tie block as any torch run (tested on manufactured duplicates in
  `tests/test_ops_distance.py::test_manufactured_ties_vs_torch_topk_recipe`).

TPU-first design: the pairwise distance matrix is a single MXU matmul
(``|q|^2 + |g|^2 - 2 q g^T``); ranks and top-k are row reductions XLA fuses
into the same pass. Queries are batched (the reference loops one sketch at a
time); the gallery matrix stays HBM-resident across queries.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

PAIRWISE_EPS = 1e-6  # torch.nn.PairwiseDistance default
COSINE_EPS = 1e-8  # torch.nn.CosineSimilarity default


def euclidean_distance(a: jax.Array, b: jax.Array, eps: float = PAIRWISE_EPS) -> jax.Array:
    """Row-wise ||a - b + eps||_2 (broadcasting), torch PairwiseDistance parity."""
    return jnp.sqrt(jnp.sum(jnp.square(a - b + eps), axis=-1))


def cosine_distance(a: jax.Array, b: jax.Array, eps: float = COSINE_EPS) -> jax.Array:
    """Row-wise ``1 - cos_sim`` in [0, 2] (broadcasting), torch parity."""
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    dot = jnp.sum(a * b, axis=-1)
    return 1.0 - dot / jnp.maximum(na * nb, eps)


def _precision(name: str):
    return (jax.lax.Precision.HIGHEST if name == "highest"
            else jax.lax.Precision.DEFAULT)


def pairwise_sq_l2(
    q: jax.Array, g: jax.Array, eps: float = 0.0, precision: str = "highest"
) -> jax.Array:
    """(Q, D) x (N, D) -> (Q, N) squared L2 distances via one MXU matmul.

    With ``eps`` nonzero this reproduces ``||q - g + eps||^2`` exactly in
    expanded form: ``|q|^2 + |g|^2 - 2 q.g + 2 eps (sum q - sum g) + D eps^2``.
    ``precision='highest'`` (default) runs full-f32 MXU passes for ranking
    parity; ``'default'`` uses bf16 passes (~3x faster matmul, ~2e-3
    relative distance error).
    """
    q = q.astype(jnp.float32)
    g = g.astype(jnp.float32)
    qq = jnp.sum(q * q, axis=-1, keepdims=True)  # (Q, 1)
    gg = jnp.sum(g * g, axis=-1)  # (N,)
    cross = jnp.dot(
        q, g.T, preferred_element_type=jnp.float32, precision=_precision(precision)
    )  # (Q, N) on MXU
    d2 = qq + gg[None, :] - 2.0 * cross
    if eps:
        d = q.shape[-1]
        corr = 2.0 * eps * (jnp.sum(q, -1, keepdims=True) - jnp.sum(g, -1)[None, :])
        d2 = d2 + corr + d * eps * eps
    return jnp.maximum(d2, 0.0)


def pairwise_l2(q: jax.Array, g: jax.Array, eps: float = PAIRWISE_EPS,
                precision: str = "highest") -> jax.Array:
    return jnp.sqrt(pairwise_sq_l2(q, g, eps=eps, precision=precision))


def pairwise_cosine(q: jax.Array, g: jax.Array, eps: float = COSINE_EPS,
                    precision: str = "highest") -> jax.Array:
    """(Q, D) x (N, D) -> (Q, N) cosine distances via one MXU matmul."""
    q = q.astype(jnp.float32)
    g = g.astype(jnp.float32)
    nq = jnp.linalg.norm(q, axis=-1, keepdims=True)  # (Q, 1)
    ng = jnp.linalg.norm(g, axis=-1)  # (N,)
    dot = jnp.dot(
        q, g.T, preferred_element_type=jnp.float32, precision=_precision(precision)
    )
    return 1.0 - dot / jnp.maximum(nq * ng[None, :], eps)


def pairwise_distance(q: jax.Array, g: jax.Array, metric: str = "euclidean",
                      precision: str = "highest") -> jax.Array:
    if metric == "euclidean":
        return pairwise_l2(q, g, precision=precision)
    if metric == "cosine":
        return pairwise_cosine(q, g, precision=precision)
    raise ValueError(f"unknown metric {metric!r} (euclidean|cosine)")


def rank_of_positive(
    dist: jax.Array, pos_idx: jax.Array, valid: jax.Array | None = None
) -> jax.Array:
    """0-based rank of the positive gallery item per query.

    ``dist`` (Q, N), ``pos_idx`` (Q,) int32. Ties at exactly the positive's
    distance are broken by gallery index — the deterministic stable-sort
    order. The reference's ``topk`` tie order is arbitrary (see module
    docstring), so this is a well-defined choice inside the same tie block,
    not a bit-match of any particular torch run.
    ``valid`` (N,) optionally masks padded gallery rows.
    """
    n = dist.shape[-1]
    d_pos = jnp.take_along_axis(dist, pos_idx[:, None], axis=-1)  # (Q, 1)
    idx = jnp.arange(n)[None, :]
    closer = dist < d_pos
    tie_before = (dist == d_pos) & (idx < pos_idx[:, None])
    hit = closer | tie_before
    if valid is not None:
        hit = hit & valid[None, :]
    return jnp.sum(hit, axis=-1).astype(jnp.int32)


def top_k(
    dist: jax.Array, k: int, valid: jax.Array | None = None
) -> Tuple[jax.Array, jax.Array]:
    """Smallest-k distances per row -> (values, indices), ascending.

    ``k`` is clamped to the gallery size (tiny-gallery safety; the reference
    always asks for k=10, `inference.py:97`)."""
    if valid is not None:
        dist = jnp.where(valid[None, :], dist, jnp.inf)
    neg_vals, idx = jax.lax.top_k(-dist, min(k, dist.shape[-1]))
    return -neg_vals, idx


@functools.partial(jax.jit, static_argnames=("metric", "k", "precision"))
def retrieve(
    queries: jax.Array,
    gallery: jax.Array,
    pos_idx: jax.Array,
    k: int = 10,
    metric: str = "euclidean",
    valid: jax.Array | None = None,
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched retrieval: (ranks, topk_values, topk_indices).

    One MXU matmul for all queries against the whole gallery, fused rank
    count + top-k. This is the single-kernel replacement for the reference's
    per-sketch python loop (reference `inference.py:94-136`).
    """
    dist = pairwise_distance(queries, gallery, metric, precision)
    ranks = rank_of_positive(dist, pos_idx, valid)
    vals, idx = top_k(dist, k, valid)
    return ranks, vals, idx


def retrieve_chunked(
    queries: jax.Array,
    gallery: jax.Array,
    pos_idx: jax.Array,
    k: int = 10,
    metric: str = "euclidean",
    precision: str = "highest",
    chunk: int = 256,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Query-chunked :func:`retrieve` for galleries where the full (Q, N)
    distance matrix is HBM-prohibitive (e.g. Q=4096, N=1M f32 is 16 GB).

    Each chunk still materializes a (chunk, N) matrix and pays
    ``lax.top_k`` over it — this is the honest XLA fallback the fused
    Pallas kernel (:mod:`art_sbir_tpu.ops.retrieval_pallas`) is benchmarked
    against at large N (see bench.py / PERF.md)."""
    nq = queries.shape[0]
    outs = [
        retrieve(queries[i : i + chunk], gallery, pos_idx[i : i + chunk],
                 k=k, metric=metric, precision=precision)
        for i in range(0, nq, chunk)
    ]
    ranks = jnp.concatenate([o[0] for o in outs])
    vals = jnp.concatenate([o[1] for o in outs])
    idx = jnp.concatenate([o[2] for o in outs])
    return ranks, vals, idx


def sharded_retrieve(
    queries: jax.Array,
    gallery: jax.Array,
    pos_idx: jax.Array,
    k: int = 10,
    metric: str = "euclidean",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Retrieval with a row-sharded gallery under a mesh.

    Call under ``jax.jit`` with ``gallery`` sharded (N/devices, D) per device
    (see :func:`art_sbir_tpu.parallel.gallery_sharding`). XLA keeps the
    distance blocks local to each shard and all-gathers only the (Q, k)
    partials plus scalar rank counts over ICI.
    """
    return retrieve(queries, gallery, pos_idx, k=k, metric=metric)
