"""Int8-quantized retrieval with exact re-ranking.

Scale lever beyond the bf16 fused stream (`ops/retrieval_pallas.py`): the
v5e MXU runs int8 dots at 2x the bf16 rate, and an int8-resident gallery
is half the HBM traffic of bf16 / a quarter of f32 — at the 1M-row regime
where retrieval is bandwidth-bound, that is the next 2x.

Decomposition (euclidean): ``d^2 = |q|^2 - 2 q.g + |g|^2``. The row norms
``|g|^2`` are precomputed EXACTLY in f32 at quantization time and ``|q|^2``
is rank-constant — only the cross term is approximated, as
``q.g ~= s_q * s_g * (q8 . g8)`` with symmetric per-row scales
(``s = max|x| / 127``) and an int32-accumulated int8 matmul
(``preferred_element_type=int32`` puts it on the MXU's int path).
Candidates are selected by approximate distance with a safety multiple
``rerank_factor * k``, then re-ranked EXACTLY on gathered f32 rows, so
top-k quality degrades only when a true top-k row falls outside the
candidate set — measured by :func:`topk_overlap` and regression-locked in
``tests/test_ops_quant.py`` (exact top-k equality on separated data,
>=97% overlap locked on adversarially-flat random data, both metrics).
Exact-distance ties re-rank by GALLERY INDEX, matching the exact path's
documented tie order (`ops/distance.py`).

Cosine: rows are L2-normalized before quantization, so the same int8 dot
approximates the cosine similarity and ``1 - sim`` re-ranks exactly.

No reference counterpart (`/root/reference/inference.py:43-56` is a f32
torch per-query loop) — this is a beyond-reference scale feature.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from art_sbir_tpu.ops.distance import cosine_distance, euclidean_distance

_METRICS = ("euclidean", "cosine")


class QuantGallery(NamedTuple):
    """Int8 gallery + exact f32 row norms (euclidean) or zeros (cosine).
    ``metric`` is host-side metadata (kept out of the jitted core)."""

    q8: jax.Array          # (N, D) int8
    scale: jax.Array       # (N,) f32 per-row symmetric scale
    sq_norm: jax.Array     # (N,) f32 exact |g|^2 (zeros for cosine)
    metric: str


def _symmetric_quantize(rows: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(rows,) -> (int8 rows, per-row scale), symmetric max-abs/127."""
    scale = jnp.maximum(jnp.max(jnp.abs(rows), axis=1), 1e-12) / 127.0
    q8 = jnp.clip(jnp.round(rows / scale[:, None]), -127, 127)
    return q8.astype(jnp.int8), scale


def _l2_normalize(x: jax.Array) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def quantize_gallery(gallery: jax.Array, metric: str = "euclidean"
                     ) -> QuantGallery:
    """Symmetric per-row int8 quantization; cosine pre-normalizes rows."""
    if metric not in _METRICS:
        raise ValueError(f"unknown metric {metric!r}; one of {_METRICS}")
    g = jnp.asarray(gallery, jnp.float32)
    if metric == "cosine":
        g = _l2_normalize(g)
    q8, scale = _symmetric_quantize(g)
    sq = (jnp.sum(g * g, axis=1) if metric == "euclidean"
          else jnp.zeros(g.shape[0], jnp.float32))
    return QuantGallery(q8, scale, sq, metric)


@functools.partial(jax.jit, static_argnames=("metric", "k", "r"))
def _quant_core(
    queries: jax.Array,
    g8: jax.Array,
    g_scale: jax.Array,
    g_sq: jax.Array,
    gallery_f32: jax.Array,
    *,
    metric: str,
    k: int,
    r: int,
) -> Tuple[jax.Array, jax.Array]:
    qf = jnp.asarray(queries, jnp.float32)
    qn = _l2_normalize(qf) if metric == "cosine" else qf
    q8, s_q = _symmetric_quantize(qn)

    # int8 MXU cross term, int32 accumulation
    dot = jax.lax.dot_general(
        q8, g8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (s_q[:, None] * g_scale[None, :])

    if metric == "euclidean":
        approx = g_sq[None, :] - 2.0 * dot  # |q|^2 is rank-constant
    else:
        approx = -dot  # 1 - sim ranks like -sim

    # candidate set by approximate score, then SORT BY GALLERY INDEX so
    # the stable exact-rerank argsort breaks exact-distance ties by index
    # (the exact path's documented tie order)
    _, cand = jax.lax.top_k(-approx, r)  # (Q, R)
    cand = jnp.sort(cand, axis=1)
    return _rerank(qf, cand, gallery_f32, metric, k)


def _rerank(qf, cand, gallery_f32, metric, k):
    """Exact rerank of index-sorted candidates on gathered f32 rows — the
    library row-wise forms, so the reported values match the exact path's
    torch-parity contract (stable argsort ties by gallery index).

    Gather FIRST, cast the (Q, R, D) rows after: casting the whole
    gallery before the take would materialize a full f32 copy per call
    (4*N*D bytes of HBM) — fatal for the bf16-resident capacity mode and
    wasted bandwidth for f32 (where the cast is a no-op either way)."""
    rows = jnp.take(jnp.asarray(gallery_f32), cand,
                    axis=0).astype(jnp.float32)
    qx = qf[:, None, :]  # un-normalized, like the exact path
    if metric == "euclidean":
        exact = euclidean_distance(qx, rows)
    else:
        exact = cosine_distance(qx, rows)
    order = jnp.argsort(exact, axis=1, stable=True)[:, :k]
    vals = jnp.take_along_axis(exact, order, axis=1)
    idx = jnp.take_along_axis(cand, order, axis=1)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def _rerank_jit(qf, cand, gallery_f32, *, metric, k):
    return _rerank(qf, cand, gallery_f32, metric, k)


def retrieve_quantized(
    queries: jax.Array,
    qg: QuantGallery,
    gallery_f32: jax.Array,
    k: int = 10,
    rerank_factor: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """(top-k values, indices), int8 candidate scan + exact f32 rerank.

    One jitted program (metric/k/rerank static). ``gallery_f32`` is the
    exact gallery used ONLY for the (Q, R, D) candidate gather
    (R = rerank_factor*k rows per query — tiny next to the (Q, N) matrix
    the exact path materializes). Values match the exact path's contract
    (eps-folded distances / 1 - cos)."""
    k = min(k, qg.q8.shape[0])
    r = min(max(rerank_factor * k, k), qg.q8.shape[0])
    return _quant_core(queries, qg.q8, qg.scale, qg.sq_norm, gallery_f32,
                       metric=qg.metric, k=k, r=r)


def retrieve_quantized_chunked(
    queries: jax.Array,
    qg: QuantGallery,
    gallery_f32: jax.Array,
    k: int = 10,
    rerank_factor: int = 8,
    chunk: int = 256,
) -> Tuple[jax.Array, jax.Array]:
    """Query-chunked :func:`retrieve_quantized` for big galleries: the
    (chunk, N) approx-score matrix is f32 either way, but the GALLERY
    read per sweep is int8 — a quarter of the exact path's f32 traffic,
    which is the bound in the bandwidth-limited big-N regime."""
    nq = queries.shape[0]
    if nq == 0:
        ke = min(k, qg.q8.shape[0])
        return (jnp.zeros((0, ke), jnp.float32),
                jnp.zeros((0, ke), jnp.int32))
    outs = [retrieve_quantized(queries[i:i + chunk], qg, gallery_f32,
                               k=k, rerank_factor=rerank_factor)
            for i in range(0, nq, chunk)]
    return (jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]))


def retrieve_quantized_fused(
    queries: jax.Array,
    qg: QuantGallery,
    gallery_f32: jax.Array,
    k: int = 10,
    rerank_factor: int = 8,
    tile_q: int | None = None,
    tile_n: int | None = None,
    interpret: bool | None = None,
    depth: int = 8,
    seg_reduce: int = 8,
    device_get: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Streamed int8 candidate scan (Pallas) + exact f32 rerank.

    Same contract as :func:`retrieve_quantized`, but the candidate scan
    runs through :func:`art_sbir_tpu.ops.retrieval_pallas.
    quant_candidates_fused`: O(Q) running state instead of the (Q, N)
    approx-score matrix, and the gallery streams as int8 — a quarter of
    the fused f32 kernel's HBM read and half its bf16 mode, which is the
    bound at the 1M-row regime. The kernel replicates the XLA scan's f32
    op order, so candidate sets (and therefore final vals/idx) are
    bit-identical whenever the per-row certificate passes; flagged rows
    (per-lane file overflow / fold collisions / r-boundary ties — rate
    set by ``depth``/``seg_reduce``/``r``, see
    :func:`quant_candidates_fused`) recompute through
    :func:`retrieve_quantized`, padded to power-of-two batches so the
    fallback compiles O(log Q) shapes, not one per bad-row count.

    ``device_get=True`` returns NUMPY arrays, pulling (vals, idx,
    certificate) in ONE device-to-host transfer instead of a certificate
    sync followed by the caller's result pull — one fewer tunnel RTT
    (~28 ms) for host-bound callers like the serving engine.
    """
    from art_sbir_tpu.ops.retrieval_pallas import quant_candidates_fused

    n = qg.q8.shape[0]
    k = min(k, n)
    r = min(max(rerank_factor * k, k), n, depth * 128)
    qf = jnp.asarray(queries, jnp.float32)
    qn = _l2_normalize(qf) if qg.metric == "cosine" else qf
    q8, s_q = _symmetric_quantize(qn)
    _, cand, cert = quant_candidates_fused(
        q8, s_q, qg.q8, qg.scale, qg.sq_norm, r=r, metric=qg.metric,
        tile_q=tile_q, tile_n=tile_n, interpret=interpret, depth=depth,
        seg_reduce=seg_reduce)
    cand = jnp.sort(cand, axis=1)
    vals, idx = _rerank_jit(qf, cand, gallery_f32, metric=qg.metric, k=k)
    if device_get:
        vals, idx, cert_h = jax.device_get((vals, idx, cert))
    else:
        cert_h = np.asarray(cert)
    if cert_h.all():
        return vals, idx
    bad = np.nonzero(cert_h == 0)[0]
    nbad = len(bad)
    pad = 1 << (nbad - 1).bit_length() if nbad > 1 else 1
    pad = min(pad, qf.shape[0])
    sel = np.pad(bad, (0, pad - nbad), mode="edge")
    vb, ib = retrieve_quantized(
        jnp.take(queries, sel, axis=0), qg, gallery_f32, k=k,
        rerank_factor=rerank_factor)
    if device_get:  # results already on host: one pull of the fallback
        vb, ib = jax.device_get((vb, ib))
        # device_get may hand back read-only views; copy the (Q, k) heads
        vals, idx = np.array(vals), np.array(idx)
        vals[bad] = vb[:nbad]
        idx[bad] = ib[:nbad]
        return vals, idx
    # device-side merge: vals/idx and the fallback outputs live on the same
    # device, so scatter there — pulling them to host first costs two extra
    # tunnel round-trips (~28 ms each through axon) per fallback
    vals = vals.at[bad].set(vb[:nbad])
    idx = idx.at[bad].set(ib[:nbad])
    return vals, idx


def retrieve_quantized_sharded(
    queries: jax.Array,
    qg: QuantGallery,
    gallery_f32: jax.Array,
    mesh: jax.sharding.Mesh,
    axis_name: str | None = None,
    k: int = 10,
    rerank_factor: int = 4,
    interpret: bool | None = None,
    use_kernel: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-chip int8 retrieval: gallery row-sharded over ``axis_name``.

    Each chip scans ITS rows for the per-shard approximate top-``r``
    (streamed Pallas kernel past the single-chip crossover, XLA int8 scan
    below it), exactly re-ranks those candidates on its OWN f32 shard
    (the gather never crosses chips), and ships only (Q, k) exact
    values + global indices; the merge lexsorts by (value, index) — the
    same global tie order as the single-device path. Cross-chip traffic
    is O(Q*k) riding ICI, like :func:`~art_sbir_tpu.ops.retrieval_pallas.
    retrieve_fused_sharded`.

    Contract: identical to "per-shard XLA top-``r`` + exact local rerank
    + exact merge" — a SUPERSET of the single-device candidate set
    (every global top-r candidate is in its shard's top-r), so top-k
    quality is >= :func:`retrieve_quantized` at the same
    ``rerank_factor``; on separated data the results coincide. Kernel
    rows whose exactness certificate fails recompute on the XLA per-shard
    scan (padded to power-of-two batches).
    """
    from art_sbir_tpu.ops.retrieval_pallas import _resolve_interpret

    ax = axis_name or mesh.axis_names[0]
    n_dev = int(mesh.shape[ax])
    n = qg.q8.shape[0]
    if n % n_dev:
        raise ValueError(
            f"gallery rows ({n}) must be divisible by the '{ax}' mesh axis "
            f"({n_dev}); pad the gallery (parallel.mesh.pad_to_multiple)")
    n_local = n // n_dev
    if k > n_local:
        raise ValueError(
            f"k={k} exceeds the per-shard gallery size {n_local}; shrink "
            "the mesh axis or pad the gallery")
    r = min(max(rerank_factor * k, k), n_local)
    if use_kernel is None:
        from art_sbir_tpu.retrieval.rank import (
            QUANT_FUSED_GALLERY_THRESHOLD)

        # auto-route only inside the MEASURED kernel envelope: probes
        # cover r<=80 and the exact kernel's extract-unroll is known-good
        # to r=k=128; beyond that the r-unrolled extract loop's compile
        # and VPU cost are unmeasured, so prefer the XLA scan (callers
        # can still force the kernel via use_kernel=True)
        use_kernel = n_local >= QUANT_FUSED_GALLERY_THRESHOLD and r <= 128
    interp = _resolve_interpret(interpret)

    qf = jnp.asarray(queries, jnp.float32)
    qn = _l2_normalize(qf) if qg.metric == "cosine" else qf
    q8, s_q = _symmetric_quantize(qn)

    vals, idx, cert = _quant_sharded_jit(
        q8, s_q, qf, qg.q8, qg.scale, qg.sq_norm,
        jnp.asarray(gallery_f32, jnp.float32), mesh=mesh, ax=ax,
        n_local=n_local, r=r, k=k, metric=qg.metric,
        use_kernel=bool(use_kernel), interpret=interp)

    cert_h = np.asarray(cert)
    if cert_h.all() or not use_kernel:
        return vals, idx
    bad = np.nonzero(cert_h == 0)[0]
    nbad = len(bad)
    pad = 1 << (nbad - 1).bit_length() if nbad > 1 else 1
    pad = min(pad, queries.shape[0])
    sel = np.pad(bad, (0, pad - nbad), mode="edge")
    vb, ib = retrieve_quantized_sharded(
        jnp.take(queries, sel, axis=0), qg, gallery_f32, mesh,
        axis_name=ax, k=k, rerank_factor=rerank_factor,
        interpret=interpret, use_kernel=False)
    vals = jnp.asarray(np.asarray(vals)).at[bad].set(np.asarray(vb)[:nbad])
    idx = jnp.asarray(np.asarray(idx)).at[bad].set(np.asarray(ib)[:nbad])
    return vals, idx


@functools.partial(jax.jit, static_argnames=(
    "mesh", "ax", "n_local", "r", "k", "metric", "use_kernel", "interpret"))
def _quant_sharded_jit(q8, s_q, qf, g8, g_scale, g_sq, gallery_f32, *,
                       mesh, ax, n_local, r, k, metric, use_kernel,
                       interpret):
    """One program: per-shard scan + local exact rerank + (value, index)
    merge. Returns (vals (Q,k), global idx (Q,k), per-row AND of shard
    certificates)."""
    from jax.sharding import PartitionSpec as P

    from art_sbir_tpu.ops.retrieval_pallas import quant_candidates_fused
    from art_sbir_tpu.ops.sharded import lexsort_topk_merge, resolve_shard_map

    shard_map = resolve_shard_map()

    def worker(q8_r, sq_r, qf_r, g8_s, sc_s, gsq_s, gal_s):
        off = jax.lax.axis_index(ax) * n_local
        if use_kernel:
            _, cand, cert = quant_candidates_fused(
                q8_r, sq_r, g8_s, sc_s, gsq_s, r=r, metric=metric,
                interpret=interpret)
        else:
            dot = jax.lax.dot_general(
                q8_r, g8_s, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (sq_r[:, None] * sc_s[None, :])
            approx = (gsq_s[None, :] - 2.0 * dot
                      if metric == "euclidean" else -dot)
            _, cand = jax.lax.top_k(-approx, r)
            cert = jnp.ones(q8_r.shape[0], jnp.int32)
        cand = jnp.sort(cand, axis=1)
        vals, idx_l = _rerank(qf_r, cand, gal_s, metric, k)
        return vals[None], (idx_l + off)[None], cert[None]

    pv, pi, pc = shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(), P(), P(ax, None), P(ax), P(ax), P(ax, None)),
        out_specs=(P(ax), P(ax), P(ax)),
        check_vma=False,  # pallas_call out_shapes carry no vma annotations
    )(q8, s_q, qf, g8, g_scale, g_sq, gallery_f32)

    vals, idx = lexsort_topk_merge(pv, pi, k)
    return vals, idx, jnp.min(pc, axis=0)


def topk_overlap(idx_a: jax.Array, idx_b: jax.Array) -> float:
    """Mean per-query overlap |A ∩ B| / k between two (Q, k) index sets —
    the recall-quality metric for approximate modes."""
    import numpy as np

    a, b = np.asarray(idx_a), np.asarray(idx_b)
    inter = [len(set(ra) & set(rb)) for ra, rb in zip(a, b)]
    return float(np.mean(inter)) / a.shape[1]
