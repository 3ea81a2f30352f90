"""Fused Pallas retrieval kernel: pairwise-L2 + rank-of-positive + top-k in
one pass over an HBM-resident gallery.

The XLA formulation (:mod:`art_sbir_tpu.ops.distance`) materializes the
(Q, N) distance matrix in HBM; at gallery scale (N >= 1M rows) that matrix
is HBM-prohibitive (Q=4096, N=1M f32 is 16 GB) and the XLA path must fall
back to query-chunked sweeps (:func:`~art_sbir_tpu.ops.distance.retrieve_chunked`)
that re-materialize (chunk, N) blocks and pay ``lax.top_k`` over each. This
kernel instead streams gallery tiles through VMEM and keeps only O(Q)
running state, so retrieval is bounded by gallery bandwidth + the MXU
cross-term — never by distance-matrix traffic.

Design (v5 — see PERF.md for the ablation that shaped it):

* **Query tiling**: grid = (q_tiles, n_tiles) with the gallery axis
  innermost; each query block's state lives in VMEM scratch for a full
  gallery sweep. Ragged edges are masked (no host-side pad copies).
* **Streaming per-lane top-4, no per-tile reductions**: the earlier design
  extracted each tile's top-k and merged it into running state — cross-lane
  min-reductions with a sequential dependency chain that cost ~54 us/step,
  7x the 9.4 us/step matmul+bandwidth roofline (measured by
  scripts/probe_fused_overhead.py). v5 instead min-merges EVERY distance
  into a per-lane top-4 register file (value+index, (TQ, 128) planes in
  scratch) — a straight-line insertion chain of elementwise selects that
  hides entirely under the MXU work. The expensive extraction (K rounds of
  cross-lane min with in-lane promotion G2<-G3<-G4) runs ONCE per sweep,
  on the last gallery tile.
* **Exactness certificate**: a lane's top-4 loses information only if >= 5
  of a row's true top-k land in the same lane (k=10 over 128 lanes:
  ~1e-6/row for random data). Every insertion tracks
  ``E = min(E, max(G4, c))`` — the smallest value ever discarded. A row's
  extraction is provably exact iff ``E > kth_value`` (strict: boundary
  ties route to the fallback). The public wrapper recomputes flagged rows
  with the exact XLA path (:func:`retrieve_chunked`) — in practice never,
  by construction under manufactured ties.
* **Reference eps parity**: torch's ``PairwiseDistance(p=2, eps=1e-6)``
  (reference `utils.py:42`) computes ``||q - g + eps||``; its expanded
  form is folded into the per-row norms (``qq' = |q|^2 + 2 eps sum(q) +
  D eps^2``, ``gg' = |g|^2 - 2 eps sum(g)``), so in-kernel distances,
  ranks and tie-breaks match :func:`art_sbir_tpu.ops.distance.retrieve`
  (which folds the same correction, `ops/distance.py:52-75`).
* **Deterministic ties**: insertions use strict ``<`` so the earliest
  column wins within a lane, and extractions tie-break on the smallest
  gallery index — the stable-sort order the XLA path defines (torch's own
  topk tie order is arbitrary; see `ops/distance.py` module docstring).

Parity envelope at ``precision='highest'``: bit-exact ranks/indices/ties
vs the XLA path at bench scale (10k gallery). At very large N the two
paths accumulate the same f32 cross terms under different MXU tilings, so
strictly-closer comparisons within ~1 ulp of ``d2pos`` can flip — measured
<=8 rank-counter flips out of ~600k at N=1M, with top-k indices/values
still identical (PERF.md). That is f32-association noise both paths carry,
not a tie-break difference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_sbir_tpu.ops.distance import (COSINE_EPS, PAIRWISE_EPS,
                                       retrieve_chunked)

BIG = 3.0e38  # "worse than any distance" sentinel for min-based top-k
DEPTH = 4  # per-lane top-DEPTH register file


def _extract_min(values, indices):
    """Row-min of ``values`` with its paired gallery index, ties broken by
    the smallest index (no gathers — Mosaic-lowerable). Returns
    (min, index, picked-mask). Sentinel entries (BIG value, sentinel
    index) may be multiply-picked; removal of sentinels is a no-op."""
    m = jnp.min(values, axis=1, keepdims=True)  # (Q, 1)
    sel = jnp.min(jnp.where(values == m, indices, jnp.int32(2**31 - 1)),
                  axis=1, keepdims=True)
    picked = (values == m) & (indices == sel)
    return m, sel, picked


def _fill_lane(acc, j, val):
    """Write ``val`` (Q, 1) into lane j of the (Q, K) accumulator."""
    lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    return jnp.where(lane == j, val, acc)


def _kernel(q_ref, qq_ref, d2pos_ref, pos_ref, g_ref, gg_ref,
            rank_ref, vals_ref, idx_ref, exact_ref,
            gs_ref, is_ref, ev_ref,
            k: int, tile_n: int, n_total: int, n_steps: int, precision,
            metric: str, seg_reduce: int, with_ranks: bool):
    t = pl.program_id(1)  # gallery tile (innermost grid axis)
    sub = tile_n // 128  # strided 128-lane segments per tile
    tq = q_ref.shape[0]

    @pl.when(t == 0)
    def _init():
        rank_ref[:] = jnp.zeros_like(rank_ref)
        gs_ref[:] = jnp.full_like(gs_ref, BIG)
        is_ref[:] = jnp.full_like(is_ref, n_total)
        ev_ref[:] = jnp.full_like(ev_ref, BIG)

    cross = jax.lax.dot_general(
        q_ref[:], g_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (TQ, TN)
    # full-tile distances, with the SAME op order as the XLA path
    # (ops/distance.py: (qq + gg) - 2*cross resp. 1 - dot/max(nq*ng, eps))
    # so exact ties agree. The (1, TN) -> (TQ, TN) sublane broadcast lowers
    # at full tile width; per-segment (1, 128) slice broadcasts do not,
    # hence one full-tile buffer here (fused into the matmul output) and
    # cheap slices below. qq/gg carry eps-folded squared norms (euclidean)
    # or plain L2 norms (cosine).
    if metric == "euclidean":
        d2full = jnp.maximum(qq_ref[:] + gg_ref[:] - 2.0 * cross, 0.0)
    else:  # cosine: torch CosineSimilarity clamp semantics
        d2full = 1.0 - cross / jnp.maximum(qq_ref[:] * gg_ref[:], COSINE_EPS)

    base = t * tile_n
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    d2p = d2pos_ref[:]  # (TQ, 1)
    pos = pos_ref[:]  # (TQ, 1) int32

    # registers for the whole tile; written back to scratch once
    def _hit(c, colseg):
        # rank: strictly closer, plus exact ties at a smaller gallery
        # index; the positive's own column never counts toward its rank
        hit = (c < d2p) | ((c == d2p) & (colseg < pos))
        return hit & (c < BIG) & (colseg != pos)

    G = [gs_ref[:, d * 128:(d + 1) * 128] for d in range(DEPTH)]
    I = [is_ref[:, d * 128:(d + 1) * 128] for d in range(DEPTH)]
    E = ev_ref[:]
    hit_acc = jnp.zeros((tq, 128), jnp.int32)
    for s0 in range(0, sub, seg_reduce):
        # segment fold: seg_reduce 128-lane segments collapse into one
        # (min, argmin) candidate per lane before the insert network — the
        # VPU bound of the sweep (see _quant_kernel / PERF.md). Fold drops
        # feed the certificate, so exactness stays per-row certified; rank
        # hits are per-column and unaffected by the fold.
        colseg = base + s0 * 128 + lane
        c = jnp.where(colseg < n_total,
                      d2full[:, s0 * 128:(s0 + 1) * 128], BIG)
        if with_ranks:
            hit_acc += _hit(c, colseg).astype(jnp.int32)
        ix = colseg
        for s in range(s0 + 1, s0 + seg_reduce):
            col2 = base + s * 128 + lane
            c2 = jnp.where(col2 < n_total,
                           d2full[:, s * 128:(s + 1) * 128], BIG)
            if with_ranks:
                hit_acc += _hit(c2, col2).astype(jnp.int32)
            # strict <: earlier columns win ties; the dropped one of
            # (c, c2) lower-bounds what the certificate must cover
            E = jnp.minimum(E, jnp.maximum(c, c2))
            ix = jnp.where(c2 < c, col2, ix)
            c = jnp.minimum(c, c2)

        # streaming top-DEPTH insert (strict <: earlier columns win ties).
        # whichever of {G1..G4, c} is discarded equals max(G4, c) — track
        # its minimum as the exactness certificate.
        E = jnp.minimum(E, jnp.maximum(G[DEPTH - 1], c))
        better = [c < G[d] for d in range(DEPTH)]
        for d in range(DEPTH - 1, 0, -1):
            G[d] = jnp.where(better[d - 1], G[d - 1],
                             jnp.where(better[d], c, G[d]))
            I[d] = jnp.where(better[d - 1], I[d - 1],
                             jnp.where(better[d], ix, I[d]))
        G[0] = jnp.where(better[0], c, G[0])
        I[0] = jnp.where(better[0], ix, I[0])

    for d in range(DEPTH):
        gs_ref[:, d * 128:(d + 1) * 128] = G[d]
        is_ref[:, d * 128:(d + 1) * 128] = I[d]
    ev_ref[:] = E
    if with_ranks:
        rank_ref[:] += jnp.sum(hit_acc, axis=1, keepdims=True)

    @pl.when(t == n_steps - 1)
    def _extract():
        # K rounds of cross-lane min with in-lane promotion through the
        # top-DEPTH file — exact whenever no lane discarded a value that
        # could belong to the top-k (certified below).
        Gx = [gs_ref[:, d * 128:(d + 1) * 128] for d in range(DEPTH)]
        Ix = [is_ref[:, d * 128:(d + 1) * 128] for d in range(DEPTH)]
        av = jnp.full((tq, k), BIG, jnp.float32)
        ai = jnp.full((tq, k), n_total, jnp.int32)
        for j in range(k):
            m, sel, picked = _extract_min(Gx[0], Ix[0])
            for d in range(DEPTH - 1):
                Gx[d] = jnp.where(picked, Gx[d + 1], Gx[d])
                Ix[d] = jnp.where(picked, Ix[d + 1], Ix[d])
            Gx[DEPTH - 1] = jnp.where(picked, BIG, Gx[DEPTH - 1])
            Ix[DEPTH - 1] = jnp.where(picked, n_total, Ix[DEPTH - 1])
            av = _fill_lane(av, j, m)
            ai = _fill_lane(ai, j, sel)
        vals_ref[:] = av
        idx_ref[:] = ai
        # certificate: nothing discarded could displace the k-th value.
        # strict >, so boundary ties defer to the exact XLA fallback.
        emin = jnp.min(ev_ref[:], axis=1, keepdims=True)
        kth = av[:, k - 1:k]
        exact_ref[:] = (emin > kth).astype(jnp.int32)


def _resolve_interpret(interpret: bool | None) -> bool:
    """None -> interpret on backends without a Mosaic compiler (CPU), so
    the same call sites run compiled on TPU and interpreted in the
    CPU-mesh test environment."""
    if interpret is not None:
        return interpret
    return jax.default_backend() == "cpu"


def retrieve_fused_core(
    queries: jax.Array,
    gallery: jax.Array,
    pos_idx: jax.Array,
    k: int = 10,
    tile_q: int | None = None,
    tile_n: int | None = None,
    interpret: bool | None = None,
    precision: str = "highest",
    metric: str = "euclidean",
    seg_reduce: int | None = None,
    with_ranks: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Jitted kernel sweep: (ranks, topk_sq_values, topk_indices, exact).

    ``exact`` is the per-row certificate; rows where it is 0 must be
    recomputed with the XLA path for guaranteed parity (the public
    :func:`retrieve_fused` does this). Benchmarks time this core — the
    certificate makes the fast path's exactness checkable without paying
    for it.

    ``seg_reduce``: segment-fold width for the insert network (None =
    auto by gallery size, see :func:`_sweep`). ``with_ranks=False`` skips
    the per-column rank-of-positive accumulation (~6 VPU ops/column) and
    returns zero ranks — the serving path, which ranks nothing."""
    if k > gallery.shape[0]:
        raise ValueError(
            f"k={k} exceeds gallery size {gallery.shape[0]}: unfilled top-k "
            "slots would hold the sentinel and fail every row's exactness "
            "certificate. Clamp k to min(k, len(gallery)) as "
            "evaluate_retrieval does.")
    return _core_jit(queries, gallery, pos_idx, k=k, tile_q=tile_q,
                     tile_n=tile_n, interpret=_resolve_interpret(interpret),
                     precision=precision, metric=metric,
                     seg_reduce=seg_reduce, with_ranks=with_ranks)


@functools.partial(jax.jit, static_argnames=(
    "k", "tile_q", "tile_n", "interpret", "precision", "metric",
    "seg_reduce", "with_ranks"))
def _core_jit(
    queries: jax.Array,
    gallery: jax.Array,
    pos_idx: jax.Array,
    k: int,
    tile_q: int | None,
    tile_n: int | None,
    interpret: bool,
    precision: str,
    metric: str,
    seg_reduce: int | None,
    with_ranks: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    qq, gg_full, d2pos = _prep_norms(queries, gallery, pos_idx, metric)
    pos2d = pos_idx.astype(jnp.int32)[:, None]
    return _sweep(queries, gallery, qq, gg_full, d2pos, pos2d, k=k,
                  tile_q=tile_q, tile_n=tile_n, interpret=interpret,
                  precision=precision, metric=metric,
                  seg_reduce=seg_reduce, with_ranks=with_ranks)


def _prep_norms(queries, gallery, pos_idx, metric):
    """(qq, gg_row, d2pos) with the exact op order of the XLA path; the
    positive gather works on globally-sharded galleries too (GSPMD)."""
    if metric not in ("euclidean", "cosine"):
        raise ValueError(f"unknown metric {metric!r} (euclidean|cosine)")
    d = queries.shape[1]
    n = gallery.shape[0]
    eps = PAIRWISE_EPS
    q32 = queries.astype(jnp.float32)
    g32 = gallery.astype(jnp.float32)
    pos_c = jnp.clip(pos_idx, 0, n - 1)
    g_pos = jnp.take(g32, pos_c, axis=0)
    cross_pos = jnp.sum(q32 * g_pos, axis=1, keepdims=True)
    if metric == "euclidean":
        # expanded-form eps folding (ops/distance.py): ||q - g + eps||^2
        # = (|q|^2 + 2 eps sum q + D eps^2) + (|g|^2 - 2 eps sum g) - 2 q.g
        qq = (jnp.sum(q32 * q32, axis=1, keepdims=True)
              + 2.0 * eps * jnp.sum(q32, axis=1, keepdims=True)
              + d * eps * eps)
        gg_full = (jnp.sum(g32 * g32, axis=1)
                   - 2.0 * eps * jnp.sum(g32, axis=1))[None, :]
        d2pos = jnp.maximum(
            qq + jnp.take(gg_full[0], pos_c)[:, None] - 2.0 * cross_pos, 0.0)
    else:  # cosine: qq/gg carry plain L2 norms (torch CosineSimilarity)
        qq = jnp.linalg.norm(q32, axis=1, keepdims=True)
        gg_full = jnp.linalg.norm(g32, axis=1)[None, :]
        d2pos = 1.0 - cross_pos / jnp.maximum(
            qq * jnp.take(gg_full[0], pos_c)[:, None], COSINE_EPS)
    return qq, gg_full, d2pos


def _sweep(queries, gallery, qq, gg_full, d2pos, pos2d, *, k, tile_q,
           tile_n, interpret, precision, metric, seg_reduce=None,
           with_ranks=True):
    """One fused sweep over ``gallery`` with fully-prepared inputs.
    ``pos2d`` indices are in GALLERY-LOCAL coordinates (the sharded path
    passes clipped local positions); returned indices are local with
    sentinel = len(gallery).

    ``seg_reduce=None`` auto-sizes the segment fold by gallery rows: the
    fold trades insert-network VPU work (the measured sweep bound past
    ~200k rows) against fold-collision fallbacks, whose per-row odds are
    ~C(k,2)*seg_reduce/N — negligible at 1M rows (0.036% at k=10, red=8)
    but 3.5%/row at 10k, so small sweeps keep the fold off and stay
    bit-identical to the pre-fold kernel."""
    if k > 128:
        raise ValueError(f"k must be <= 128 (per-lane extraction), got {k}")
    nq, d = queries.shape
    n = gallery.shape[0]
    if seg_reduce is None:
        seg_reduce = 8 if n >= 200_000 else (4 if n >= 50_000 else 1)
    if seg_reduce < 1:
        raise ValueError(f"seg_reduce must be >= 1, got {seg_reduce}")
    # default tiles sized to the 16 MB VMEM budget (gallery tile double
    # buffer + cross + d2full dominate the kernel stack)
    if tile_n is None:
        tile_n = 1024
    if tile_q is None:
        tile_q = 256 if precision == "highest" else 512
    tile_n = min(tile_n, max(128, -(-n // 128) * 128))
    tile_q = min(tile_q, max(8, -(-nq // 8) * 8))
    if tile_n % 128:
        raise ValueError(f"tile_n must be a multiple of 128, got {tile_n}")

    if precision == "default":
        # bf16 gallery stream: half the HBM traffic, fast MXU passes.
        # no-op casts when the caller already keeps bf16 copies.
        q_in = queries.astype(jnp.bfloat16)
        g_in = gallery.astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        q_in = queries.astype(jnp.float32)
        g_in = gallery.astype(jnp.float32)
        prec = jax.lax.Precision.HIGHEST

    n_steps = -(-n // tile_n)
    q_steps = -(-nq // tile_q)
    sub = tile_n // 128
    while sub % seg_reduce:  # largest divisor of sub <= requested
        seg_reduce -= 1
    kernel = functools.partial(_kernel, k=k, tile_n=tile_n, n_total=n,
                               n_steps=n_steps, precision=prec,
                               metric=metric, seg_reduce=seg_reduce,
                               with_ranks=with_ranks)
    rank2d, vals2d, idx2d, exact2d = pl.pallas_call(
        kernel,
        grid=(q_steps, n_steps),
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda tq, tn: (tn, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda tq, tn: (0, tn),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 1), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, 1), jnp.int32),
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
            jax.ShapeDtypeStruct((nq, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, DEPTH * 128), jnp.float32),
            pltpu.VMEM((tile_q, DEPTH * 128), jnp.int32),
            pltpu.VMEM((tile_q, 128), jnp.float32),
        ],
        # the default 16 MiB *scoped* vmem budget rejects f32 tiles that fit
        # comfortably in the 128 MiB physical VMEM; raise it (the axon
        # plugin rejects the XLA_FLAGS route, but Mosaic kernel params are
        # forwarded per-compile)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q_in, qq, d2pos, pos2d, g_in, gg_full)

    return rank2d[:, 0], vals2d, idx2d, exact2d[:, 0]


def retrieve_fused(
    queries: jax.Array,
    gallery: jax.Array,
    pos_idx: jax.Array,
    k: int = 10,
    tile_q: int | None = None,
    tile_n: int | None = None,
    interpret: bool | None = None,
    precision: str = "highest",
    metric: str = "euclidean",
    seg_reduce: int | None = None,
    with_ranks: bool = True,
    device_get: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(ranks, topk_values, topk_indices) over the streamed gallery.

    ``metric='euclidean'`` reports *squared* eps-folded distances (take
    sqrt for the XLA path's value contract); ``'cosine'`` reports
    ``1 - cos_sim`` directly, matching :func:`pairwise_cosine`.

    Matches :func:`art_sbir_tpu.ops.distance.retrieve` semantics including
    the torch PairwiseDistance ``eps=1e-6`` folding (values are *squared*
    eps-folded distances; take sqrt for reporting parity).

    ``precision='highest'`` runs full-f32 MXU passes for rank/tie parity
    with the XLA path. ``'default'`` streams the gallery in bfloat16 —
    half the HBM traffic and faster MXU passes at ~1e-2 relative distance
    error (top-k sets are stable; exact tie order may differ and fallback
    rows recompute at XLA-default numerics). For repeated big-N sweeps
    pass the gallery already as bfloat16 to skip the per-call cast.

    Memory: O(Q) state instead of the XLA path's O(Q*N) distance matrix;
    the gallery is read ceil(Q / tile_q) times, so batch queries as large
    as VMEM allows when sweeping big galleries.

    Rows whose in-kernel exactness certificate fails (>= DEPTH+1 of the
    row's true top-k in one VPU lane, a fold-bucket collision between two
    top-k rows, or value ties at the k-th boundary — always detected;
    odds on continuous data ~C(k,2)*seg_reduce/N, see :func:`_sweep`) are
    recomputed with the exact XLA path; this host-side check syncs on the
    result, which retrieval callers do anyway.

    ``with_ranks=False`` skips the rank-of-positive accumulation (the
    serving path ranks nothing) and returns zero ranks.

    ``device_get=True`` returns NUMPY arrays, pulling (ranks, vals, idx,
    certificate) in ONE device-to-host transfer instead of syncing the
    certificate first and letting the caller pull results in a second
    round-trip — for callers that need host values anyway (the serving
    engine), this halves the transfer count on the critical path
    (~28 ms/RTT through the axon tunnel).
    """
    ranks, vals, idx, exact = retrieve_fused_core(
        queries, gallery, pos_idx, k=k, tile_q=tile_q, tile_n=tile_n,
        interpret=interpret, precision=precision, metric=metric,
        seg_reduce=seg_reduce, with_ranks=with_ranks)
    if device_get:
        ranks, vals, idx, exact_h = jax.device_get(
            (ranks, vals, idx, exact))
    else:
        exact_h = np.asarray(exact)
    if exact_h.all():
        return ranks, vals, idx
    bad = np.nonzero(exact_h == 0)[0]
    rb, vb, ib = retrieve_chunked(
        jnp.take(queries, bad, axis=0), gallery,
        jnp.take(pos_idx, bad, axis=0), k=k, precision=precision,
        metric=metric, chunk=min(256, max(1, len(bad))))
    if metric == "euclidean":
        # XLA fallback returns sqrt'd eps-folded distances; square for the
        # kernel's squared-value contract
        vb = jnp.square(vb)
    if device_get:  # results already on host: one pull of the fallback
        # device_get may hand back read-only views; copy before writing.
        # with_ranks=False (the serving path) keeps the kernel's zero
        # ranks — skip the rb transfer and the ranks copy entirely.
        if with_ranks:
            rb, vb, ib = jax.device_get((rb, vb, ib))
            ranks = np.array(ranks)
            ranks[bad] = rb
        else:
            vb, ib = jax.device_get((vb, ib))
        vals, idx = np.array(vals), np.array(idx)
        vals[bad] = vb
        idx[bad] = ib
        return ranks, vals, idx
    # device-side merge (same device for kernel + fallback outputs): the
    # host pull/re-push alternative costs ~2 tunnel RTTs per fallback. The
    # sharded variant below keeps the host merge — its outputs carry mesh
    # shardings that a mixed-operand scatter would have to reshard.
    if with_ranks:  # else keep the kernel's zero ranks uniformly
        ranks = ranks.at[bad].set(rb)
    vals = vals.at[bad].set(vb)
    idx = idx.at[bad].set(ib)
    return ranks, vals, idx


def _quant_kernel(q8_ref, sq_ref, g8_ref, gsc_ref, gsq_ref,
                  vals_ref, idx_ref, exact_ref,
                  gs_ref, is_ref, ev_ref,
                  r: int, tile_n: int, n_total: int, n_steps: int,
                  depth: int, metric: str, seg_reduce: int):
    """Int8 streaming candidate scan: per-lane top-``depth`` over the
    APPROXIMATE int8 score, extracting the top-``r`` candidate set on the
    last gallery tile. Same streaming structure as :func:`_kernel`, with
    three differences: the gallery streams as int8 (quarter of the f32
    HBM traffic) through an int8 MXU pass (``preferred_element_type=
    int32`` — 2x the bf16 rate on v5e), the score is the exact-op-order
    replica of :func:`art_sbir_tpu.ops.quant._quant_core`'s approximate
    distance (so candidate sets match the XLA int8 path bit-for-bit), and
    there is no rank-of-positive (int8 scores cannot order the full
    gallery exactly; the caller re-ranks candidates on exact f32 rows).

    ``seg_reduce`` folds that many 128-lane segments into ONE candidate
    per lane (a running (min, argmin) with the min-of-dropped feeding the
    certificate) before the depth-insert network runs. The insert network
    is the VPU bound of the whole sweep (~11 ms per depth-2 increment at
    1M rows, measured), and the fold costs ~4 ops/column vs the insert's
    ~3*depth+2, so seg_reduce=8 cuts the dominant term 8x. Exactness is
    never silently lost: a second top-r candidate landing in the same
    (lane, fold-bucket) is dropped, but its value lower-bounds ``ev`` so
    the per-row certificate fails and the caller falls back to the XLA
    scan (collision odds at r=40: C(40,2)/(N/seg_reduce) per row)."""
    t = pl.program_id(1)
    sub = tile_n // 128
    tq = q8_ref.shape[0]

    @pl.when(t == 0)
    def _init():
        gs_ref[:] = jnp.full_like(gs_ref, BIG)
        is_ref[:] = jnp.full_like(is_ref, n_total)
        ev_ref[:] = jnp.full_like(ev_ref, BIG)

    cross = jax.lax.dot_general(
        q8_ref[:], g8_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)  # (TQ, TN) exact int32 accumulation
    # EXACT op order of ops/quant.py::_quant_core: dot = cross * (s_q*s_g);
    # euclidean approx = g_sq - 2*dot, cosine approx = -dot — f32 rounding
    # agrees bitwise, so kernel candidates == XLA candidates.
    sg = sq_ref[:] * gsc_ref[:]  # (TQ,1)*(1,TN) -> (TQ, TN)
    dot = cross * sg
    if metric == "euclidean":
        d2full = gsq_ref[:] - 2.0 * dot
    else:
        d2full = -dot

    base = t * tile_n
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)

    G = [gs_ref[:, d * 128:(d + 1) * 128] for d in range(depth)]
    I = [is_ref[:, d * 128:(d + 1) * 128] for d in range(depth)]
    E = ev_ref[:]
    for s0 in range(0, sub, seg_reduce):
        colseg = base + s0 * 128 + lane
        c = jnp.where(colseg < n_total,
                      d2full[:, s0 * 128:(s0 + 1) * 128], BIG)
        ix = colseg
        for s in range(s0 + 1, s0 + seg_reduce):
            col2 = base + s * 128 + lane
            c2 = jnp.where(col2 < n_total,
                           d2full[:, s * 128:(s + 1) * 128], BIG)
            # whichever of (c, c2) loses the fold is dropped — its value
            # lower-bounds everything the certificate must account for.
            # Strict <: the earlier column wins ties (the XLA scan's
            # lax.top_k tie order), and a dropped boundary tie fails the
            # certificate via E == r-th value.
            E = jnp.minimum(E, jnp.maximum(c, c2))
            ix = jnp.where(c2 < c, col2, ix)
            c = jnp.minimum(c, c2)
        E = jnp.minimum(E, jnp.maximum(G[depth - 1], c))
        better = [c < G[d] for d in range(depth)]
        for d in range(depth - 1, 0, -1):
            G[d] = jnp.where(better[d - 1], G[d - 1],
                             jnp.where(better[d], c, G[d]))
            I[d] = jnp.where(better[d - 1], I[d - 1],
                             jnp.where(better[d], ix, I[d]))
        G[0] = jnp.where(better[0], c, G[0])
        I[0] = jnp.where(better[0], ix, I[0])

    for d in range(depth):
        gs_ref[:, d * 128:(d + 1) * 128] = G[d]
        is_ref[:, d * 128:(d + 1) * 128] = I[d]
    ev_ref[:] = E

    @pl.when(t == n_steps - 1)
    def _extract():
        Gx = [gs_ref[:, d * 128:(d + 1) * 128] for d in range(depth)]
        Ix = [is_ref[:, d * 128:(d + 1) * 128] for d in range(depth)]
        av = jnp.full((tq, r), BIG, jnp.float32)
        ai = jnp.full((tq, r), n_total, jnp.int32)
        for j in range(r):
            m, sel, picked = _extract_min(Gx[0], Ix[0])
            for d in range(depth - 1):
                Gx[d] = jnp.where(picked, Gx[d + 1], Gx[d])
                Ix[d] = jnp.where(picked, Ix[d + 1], Ix[d])
            Gx[depth - 1] = jnp.where(picked, BIG, Gx[depth - 1])
            Ix[depth - 1] = jnp.where(picked, n_total, Ix[depth - 1])
            av = _fill_lane(av, j, m)
            ai = _fill_lane(ai, j, sel)
        vals_ref[:] = av
        idx_ref[:] = ai
        emin = jnp.min(ev_ref[:], axis=1, keepdims=True)
        rth = av[:, r - 1:r]
        exact_ref[:] = (emin > rth).astype(jnp.int32)


def quant_candidates_fused(
    q8: jax.Array,
    s_q: jax.Array,
    g8: jax.Array,
    g_scale: jax.Array,
    g_sq: jax.Array,
    r: int,
    metric: str = "euclidean",
    tile_q: int | None = None,
    tile_n: int | None = None,
    interpret: bool | None = None,
    depth: int = 8,
    seg_reduce: int = 8,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Streamed int8 candidate scan: (approx_scores, cand_idx, exact), each
    row's ``r`` best gallery indices by the int8-approximate score.

    Inputs are pre-quantized (``ops.quant.quantize_gallery`` /
    ``_symmetric_quantize``): ``q8 (Q, D) int8`` with per-row scales
    ``s_q (Q,)``, ``g8 (N, D) int8`` with ``g_scale (N,)`` and exact
    ``g_sq = |g|^2 (N,)`` (zeros for cosine). O(Q·depth·128) running
    state — no (Q, N) score matrix — so the sweep is bounded by the int8
    gallery read (a quarter of the f32 fused stream) plus the int8 MXU
    pass. ``exact`` certifies per row that the candidate set equals the
    exact top-``r`` by approximate score (per-lane top-``depth`` overflow
    and r-boundary ties are detected); flagged rows must be recomputed by
    the XLA int8 scan for the locked candidate-quality contract.

    ``depth``/``seg_reduce`` trade VPU insert cost against certificate
    pass rate (failed rows recompute on the XLA scan). Defaults are the
    measured END-TO-END 1M-row sweet spot (scripts/probe_quant_depth.py):
    with the segment fold, depth=8's deeper per-lane files cost nothing
    (19.5 vs 20.0 ms at r=40 — the fold, not the insert network, is the
    VPU term) and cut the certificate failure count ~2-4x (fold
    collisions dominate; flat 1M corpus, Q=4096: depth=8 fails 17 rows
    at r=40 / 72 at r=80 vs depth=4's 27 / 290). That matters because
    the padded XLA rescan's (Qb, N) lax.top_k is superlinear in the pad
    bucket (~0 ms at Qb=32, 10.6 at 128, 89.2 at 512, behind a host
    sync): at r=40 both depths land in the cheap bucket, at r=80 depth=8
    is 1.7x faster e2e. depth=4 remains the low-VMEM option for tiny
    tiles. ``seg_reduce`` is clamped to the largest divisor of the
    per-tile segment count.
    """
    if metric not in ("euclidean", "cosine"):
        raise ValueError(f"unknown metric {metric!r} (euclidean|cosine)")
    n = g8.shape[0]
    if r > n:
        raise ValueError(f"r={r} exceeds gallery size {n}")
    if r > depth * 128:
        raise ValueError(f"r={r} exceeds the per-lane file capacity "
                         f"depth*128={depth * 128}")
    if seg_reduce < 1:
        raise ValueError(f"seg_reduce must be >= 1, got {seg_reduce}")
    return _quant_jit(q8, s_q, g8, g_scale, g_sq, r=r, metric=metric,
                      tile_q=tile_q, tile_n=tile_n,
                      interpret=_resolve_interpret(interpret), depth=depth,
                      seg_reduce=seg_reduce)


@functools.partial(jax.jit, static_argnames=(
    "r", "metric", "tile_q", "tile_n", "interpret", "depth", "seg_reduce"))
def _quant_jit(q8, s_q, g8, g_scale, g_sq, *, r, metric, tile_q, tile_n,
               interpret, depth, seg_reduce):
    nq, d = q8.shape
    n = g8.shape[0]
    if tile_n is None:
        tile_n = 1024
    if tile_q is None:
        tile_q = 256
    tile_n = min(tile_n, max(128, -(-n // 128) * 128))
    tile_q = min(tile_q, max(8, -(-nq // 8) * 8))
    if tile_n % 128:
        raise ValueError(f"tile_n must be a multiple of 128, got {tile_n}")

    n_steps = -(-n // tile_n)
    q_steps = -(-nq // tile_q)
    sub = tile_n // 128
    while sub % seg_reduce:  # largest divisor of sub <= requested
        seg_reduce -= 1
    kernel = functools.partial(_quant_kernel, r=r, tile_n=tile_n,
                               n_total=n, n_steps=n_steps, depth=depth,
                               metric=metric, seg_reduce=seg_reduce)
    vals2d, idx2d, exact2d = pl.pallas_call(
        kernel,
        grid=(q_steps, n_steps),
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda tq, tn: (tn, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda tq, tn: (0, tn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda tq, tn: (0, tn),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, r), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, r), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, r), jnp.float32),
            jax.ShapeDtypeStruct((nq, r), jnp.int32),
            jax.ShapeDtypeStruct((nq, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, depth * 128), jnp.float32),
            pltpu.VMEM((tile_q, depth * 128), jnp.int32),
            pltpu.VMEM((tile_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q8, s_q.reshape(nq, 1).astype(jnp.float32), g8,
      g_scale.reshape(1, n).astype(jnp.float32),
      g_sq.reshape(1, n).astype(jnp.float32))
    return vals2d, idx2d, exact2d[:, 0]


def retrieve_fused_sharded_core(
    queries: jax.Array,
    gallery: jax.Array,
    pos_idx: jax.Array,
    mesh: jax.sharding.Mesh,
    axis_name: str | None = None,
    k: int = 10,
    tile_q: int | None = None,
    tile_n: int | None = None,
    interpret: bool | None = None,
    precision: str = "highest",
    metric: str = "euclidean",
    seg_reduce: int | None = None,
    with_ranks: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Resolve the interpret default, then dispatch to the jitted sweep
    (see :func:`_sharded_core_jit` for the algorithm)."""
    # each chip's kernel runs top-k over only its n_local = N/devices rows,
    # so the guard must bound k by the SHARD size, not the global N
    ax = axis_name or mesh.axis_names[0]
    n_local = gallery.shape[0] // max(int(mesh.shape[ax]), 1)
    if k > n_local:
        raise ValueError(
            f"k={k} exceeds the per-shard gallery size {n_local} "
            f"({gallery.shape[0]} rows over {mesh.shape[ax]} devices): "
            "unfilled per-shard top-k slots would hold the sentinel and "
            "fail every row's exactness certificate. Clamp k to the shard "
            "size (evaluate_retrieval clamps to the global size; shrink "
            "the mesh axis or pad the gallery for larger k).")
    return _sharded_core_jit(
        queries, gallery, pos_idx, mesh=mesh, axis_name=axis_name, k=k,
        tile_q=tile_q, tile_n=tile_n,
        interpret=_resolve_interpret(interpret), precision=precision,
        metric=metric, seg_reduce=seg_reduce, with_ranks=with_ranks)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis_name", "k", "tile_q", "tile_n",
                              "interpret", "precision", "metric",
                              "seg_reduce", "with_ranks"))
def _sharded_core_jit(
    queries: jax.Array,
    gallery: jax.Array,
    pos_idx: jax.Array,
    mesh: jax.sharding.Mesh,
    axis_name: str | None,
    k: int,
    tile_q: int | None,
    tile_n: int | None,
    interpret: bool,
    precision: str,
    metric: str,
    seg_reduce: int | None,
    with_ranks: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Multi-chip fused retrieval: gallery row-sharded over ``axis_name``.

    Every chip streams its gallery shard through the fused kernel
    (queries/positive distances replicated), then the per-shard (Q, k)
    candidates merge by (value, global index) and the per-shard rank
    partials sum — the cross-chip traffic is O(Q*k) candidates + Q ints
    riding ICI, never distance blocks. Tie-breaking is globally
    deterministic: shard-local index order equals global order within a
    shard (offsets are monotone), and the merge lexsorts on (value,
    global index).

    The positive's rank decomposes exactly across shards: each shard
    counts strictly-closer rows plus value-ties at a smaller GLOBAL index,
    implemented by clipping the positive's local position to ``-1`` (all
    shard columns are globally after the positive) or ``n_local`` (all
    before). Returns (ranks, vals, idx, exact) like
    :func:`retrieve_fused_core`; ``exact`` is the AND of per-shard
    certificates.
    """
    from jax.sharding import PartitionSpec as P

    from art_sbir_tpu.ops.sharded import lexsort_topk_merge, resolve_shard_map

    shard_map = resolve_shard_map()
    ax = axis_name or mesh.axis_names[0]
    n_dev = int(mesh.shape[ax])
    n = gallery.shape[0]
    if n % n_dev:
        raise ValueError(
            f"gallery rows ({n}) must be divisible by the '{ax}' mesh axis "
            f"({n_dev}); pad the gallery (see parallel.mesh.pad_to_multiple)")
    n_local = n // n_dev

    # replicated query-side inputs with the exact global op order; the
    # positive gather spans shards (GSPMD inserts the collective)
    qq, _, d2pos = _prep_norms(queries, gallery, pos_idx, metric)
    pos_i32 = pos_idx.astype(jnp.int32)

    def worker(q, qq_r, d2pos_r, pos, g_shard):
        off = jax.lax.axis_index(ax) * n_local
        # local position: -1 = positive globally before this shard (no
        # ties count), n_local = globally after (all ties count)
        pos_local = jnp.clip(pos - off, -1, n_local)[:, None]
        g32 = g_shard.astype(jnp.float32)
        if metric == "euclidean":
            eps = PAIRWISE_EPS
            gg = (jnp.sum(g32 * g32, axis=1)
                  - 2.0 * eps * jnp.sum(g32, axis=1))[None, :]
        else:
            gg = jnp.linalg.norm(g32, axis=1)[None, :]
        ranks, vals, idx, exact = _sweep(
            q, g_shard, qq_r, gg, d2pos_r, pos_local, k=k, tile_q=tile_q,
            tile_n=tile_n, interpret=interpret, precision=precision,
            metric=metric, seg_reduce=seg_reduce, with_ranks=with_ranks)
        idx = jnp.where(idx >= n_local, n, idx + off)  # global indices
        return ranks[None], vals[None], idx[None], exact[None]

    pr, pv, pi, pe = shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(ax, None)),
        out_specs=(P(ax), P(ax), P(ax), P(ax)),
        check_vma=False,  # pallas_call out_shapes carry no vma annotations
    )(queries, qq, d2pos, pos_i32, gallery)

    ranks = jnp.sum(pr, axis=0)
    vals, idx = lexsort_topk_merge(pv, pi, k)
    exact = jnp.min(pe, axis=0)
    return ranks, vals, idx, exact


def retrieve_fused_sharded(
    queries: jax.Array,
    gallery: jax.Array,
    pos_idx: jax.Array,
    mesh: jax.sharding.Mesh,
    axis_name: str | None = None,
    k: int = 10,
    tile_q: int | None = None,
    tile_n: int | None = None,
    interpret: bool | None = None,
    precision: str = "highest",
    metric: str = "euclidean",
    seg_reduce: int | None = None,
    with_ranks: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Public multi-chip fused retrieval with the certificate fallback
    (see :func:`retrieve_fused`); value contract matches it per metric."""
    ranks, vals, idx, exact = retrieve_fused_sharded_core(
        queries, gallery, pos_idx, mesh, axis_name=axis_name, k=k,
        tile_q=tile_q, tile_n=tile_n, interpret=interpret,
        precision=precision, metric=metric, seg_reduce=seg_reduce,
        with_ranks=with_ranks)
    exact_h = np.asarray(exact)
    if exact_h.all():
        return ranks, vals, idx
    bad = np.nonzero(exact_h == 0)[0]
    rb, vb, ib = retrieve_chunked(
        jnp.take(queries, bad, axis=0), gallery,
        jnp.take(pos_idx, bad, axis=0), k=k, precision=precision,
        metric=metric, chunk=min(256, max(1, len(bad))))
    if metric == "euclidean":
        vb = jnp.square(vb)
    ranks = jnp.asarray(np.asarray(ranks)).at[bad].set(rb)
    vals = jnp.asarray(np.asarray(vals)).at[bad].set(vb)
    idx = jnp.asarray(np.asarray(idx)).at[bad].set(ib)
    return ranks, vals, idx
