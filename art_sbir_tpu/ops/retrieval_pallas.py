"""Fused Pallas retrieval kernel: pairwise-L2 + rank-of-positive + top-k in
one pass over an HBM-resident gallery.

The XLA formulation (:mod:`art_sbir_tpu.ops.distance`) materializes the
(Q, N) distance matrix in HBM; at gallery scale (N >= 1M rows) that matrix
is HBM-prohibitive (Q=4096, N=1M f32 is 16 GB) and the XLA path must fall
back to query-chunked sweeps that re-materialize (chunk, N) blocks and pay
``lax.top_k`` over each. This kernel instead streams gallery tiles through
VMEM and keeps only (Q, 2K) running top-k state + (Q,) rank counters, so
retrieval is bounded by gallery bandwidth + the MXU cross-term — never by
distance-matrix traffic. It also sidesteps XLA's pathologically slow
``precision=HIGHEST`` dot lowering on this backend (measured ~19-30x slower
than the same-precision in-kernel ``dot_general``; see PERF.md).

Design (see VERDICT.md round-1 item 4):

* **Query tiling**: grid = (q_tiles, n_tiles) with the gallery axis
  innermost, so each query block stays VMEM-resident for a full gallery
  sweep and the running state lives in revisited output blocks. Arbitrary
  Q no longer has to fit in one VMEM block. Ragged edges are handled by
  masking (no host-side pad copies — padding a 4 GB gallery per call costs
  more than the whole sweep).
* **One pass over the tile**: the MXU cross block is the only full-tile
  buffer; distances, rank hits, candidate counts, and a per-lane-group
  running top-2 are all computed in a single loop over 128-lane segments,
  so VMEM holds ~one (TQ, TN) f32 block and tiles can be large (fewer,
  bigger grid steps).
* **Hierarchical top-k (group-top-2 pre-reduction)**: candidates (elements
  <= the running k-th best) are reduced lane-wise to a per-group top-2
  (group = one lane, tile_n/128 strided columns). The K extraction rounds
  then run on the (TQ, 128) group matrix with in-lane replacement by the
  group's second-best — exact whenever every group holds <= 2 candidates.
  The expected number of running-top-k updates over a random stream is
  K*ln(N/K) per query, so past the first tiles candidates are rare and
  groups essentially never hold 3. When one does (and always on a sweep's
  first tile, where the unfilled state makes everything a candidate), a
  ``lax.cond`` falls back to an exact lexicographic multi-scan: round j
  re-scans the segments keeping only elements lex-greater than the (value,
  index) extracted in round j-1 — no extra full-tile buffers.
* **Reference eps parity**: torch's ``PairwiseDistance(p=2, eps=1e-6)``
  (reference `utils.py:42`) computes ``||q - g + eps||``; its expanded
  form is folded into the per-row norms (``qq' = |q|^2 + 2 eps sum(q) +
  D eps^2``, ``gg' = |g|^2 - 2 eps sum(g)``), so in-kernel distances,
  ranks and tie-breaks match :func:`art_sbir_tpu.ops.distance.retrieve`
  (which folds the same correction, `ops/distance.py:52-75`).
* **Deterministic ties**: all extractions tie-break on the smallest
  gallery index (the stable-sort order the XLA path defines; torch's own
  topk tie order is arbitrary — see `ops/distance.py` module docstring).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_sbir_tpu.ops.distance import PAIRWISE_EPS

BIG = 3.0e38  # "worse than any distance" sentinel for min-based top-k


def _extract_min(values, indices):
    """Row-min of ``values`` with its paired gallery index, ties broken by
    the smallest index (no gathers — Mosaic-lowerable). Returns
    (min, index, values-with-that-element-removed). Sentinel entries
    (BIG value, sentinel index) may be multiply-picked; they are already
    BIG so removal is a no-op."""
    m = jnp.min(values, axis=1, keepdims=True)  # (Q, 1)
    sel = jnp.min(jnp.where(values == m, indices, jnp.int32(2**31 - 1)),
                  axis=1, keepdims=True)
    picked = (values == m) & (indices == sel)
    remaining = jnp.where(picked, BIG, values)
    return m, sel, remaining


def _fill_lane(acc, j, val):
    """Write ``val`` (Q, 1) into lane j of the (Q, K) accumulator."""
    lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    return jnp.where(lane == j, val, acc)


def _kernel(q_ref, qq_ref, d2pos_ref, pos_ref, g_ref, gg_ref,
            rank_ref, vals_ref, idx_ref, k: int, tile_q: int, tile_n: int,
            nq_total: int, n_total: int, precision):
    t = pl.program_id(1)  # gallery tile (innermost grid axis)
    sub = tile_n // 128  # strided 128-lane segments per tile

    @pl.when(t == 0)
    def _init():
        rank_ref[:] = jnp.zeros_like(rank_ref)
        vals_ref[:] = jnp.full_like(vals_ref, BIG)
        idx_ref[:] = jnp.full_like(idx_ref, n_total)

    q = q_ref[:]  # (TQ, D)
    g = g_ref[:]  # (TN, D)
    qq = qq_ref[:]  # (TQ, 1) eps-folded |q|^2
    gg = gg_ref[:]  # (1, TN) eps-folded |g|^2

    cross = jax.lax.dot_general(
        q, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )  # (TQ, TN)
    # full-tile distances, with the SAME op order as the XLA path
    # (ops/distance.py:70: (qq + gg) - 2*cross) so exact ties agree. The
    # (1, TN) -> (TQ, TN) sublane broadcast lowers at full tile width;
    # per-segment (1, 128) slice broadcasts do not, hence one full-tile
    # buffer here (fused into the matmul output) and cheap slices below.
    d2full = jnp.maximum(qq + gg - 2.0 * cross, 0.0)

    base = t * tile_n
    tq = cross.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    d2p = d2pos_ref[:]  # (TQ, 1)
    pos = pos_ref[:]  # (TQ, 1) int32
    thresh = vals_ref[:, k - 1 : k]  # running k-th best
    # mask garbage rows of a ragged final query block: their uninitialized
    # distances would otherwise count as candidates and force the slow path
    row = jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    rvalid = row + pl.program_id(0) * tile_q < nq_total  # (TQ, 1)
    thresh = jnp.where(rvalid, thresh, -1.0)  # no candidates on dead rows

    def seg_d2(s):
        """Masked eps-folded squared distances of segment s + its columns."""
        colseg = base + s * 128 + lane
        d2s = jnp.where(colseg < n_total,
                        d2full[:, s * 128 : (s + 1) * 128], BIG)
        return d2s, colseg

    # single pass over segments: rank partials + candidate counts +
    # per-lane running top-2 (value, column)
    hit_acc = jnp.zeros((tq, 128), jnp.int32)
    cnt = jnp.zeros((tq, 128), jnp.int32)
    g1 = jnp.full((tq, 128), BIG, jnp.float32)
    i1 = jnp.full((tq, 128), n_total, jnp.int32)
    g2 = jnp.full((tq, 128), BIG, jnp.float32)
    i2 = jnp.full((tq, 128), n_total, jnp.int32)
    for s in range(sub):
        d2s, colseg = seg_d2(s)
        hit = (d2s < d2p) | ((d2s == d2p) & (colseg < pos))
        hit = hit & (d2s < BIG) & (colseg != pos)
        hit_acc += hit.astype(jnp.int32)

        c = jnp.where(d2s <= thresh, d2s, BIG)  # candidates only
        cnt += (c < BIG).astype(jnp.int32)
        # running top-2 insert (strict <, so earlier columns win ties)
        better1 = c < g1
        better2 = (c < g2) & ~better1
        g2 = jnp.where(better1, g1, jnp.where(better2, c, g2))
        i2 = jnp.where(better1, i1, jnp.where(better2, colseg, i2))
        g1 = jnp.where(better1, c, g1)
        i1 = jnp.where(better1, colseg, i1)
    i1 = jnp.where(g1 < BIG, i1, n_total)
    i2 = jnp.where(g2 < BIG, i2, n_total)

    rank_ref[:] += jnp.sum(hit_acc, axis=1, keepdims=True)

    cmax = jnp.max(jnp.sum(cnt, axis=1, keepdims=True))  # most cands per row
    deep = jnp.max(cnt)  # deepest single lane group

    @pl.when(cmax > 0)
    def _insert_and_merge():
        def fast(_):
            # exact while every group holds <= 2 candidates: extract with
            # in-lane replacement by the group's second-best
            av = jnp.full((tq, k), BIG, jnp.float32)
            ai = jnp.full((tq, k), n_total, jnp.int32)
            work, wi, sec, si = g1, i1, g2, i2
            for j in range(k):
                m, sel, _ = _extract_min(work, wi)
                picked = (work == m) & (wi == sel)
                work = jnp.where(picked, sec, work)
                wi = jnp.where(picked, si, wi)
                sec = jnp.where(picked, BIG, sec)
                si = jnp.where(picked, n_total, si)
                av = _fill_lane(av, j, m)
                ai = _fill_lane(ai, j, sel)
            return av, ai

        def slow(_):
            # exact lexicographic multi-scan: round j keeps only elements
            # (value, col) lex-greater than round j-1's pick, re-reducing
            # the segments each round — k extra tile passes, no buffers.
            av = jnp.full((tq, k), BIG, jnp.float32)
            ai = jnp.full((tq, k), n_total, jnp.int32)
            last_v = jnp.full((tq, 1), -1.0, jnp.float32)
            last_i = jnp.full((tq, 1), -1, jnp.int32)
            for j in range(k):
                best = jnp.full((tq, 128), BIG, jnp.float32)
                bidx = jnp.full((tq, 128), n_total, jnp.int32)
                for s in range(sub):
                    d2s, colseg = seg_d2(s)
                    ok = (d2s <= thresh) & (
                        (d2s > last_v) | ((d2s == last_v) & (colseg > last_i))
                    )
                    c = jnp.where(ok, d2s, BIG)
                    better = c < best
                    bidx = jnp.where(better, colseg, bidx)
                    best = jnp.minimum(c, best)
                m, sel, _ = _extract_min(best, bidx)
                av = _fill_lane(av, j, m)
                ai = _fill_lane(ai, j, sel)
                last_v, last_i = m, sel
            return av, ai

        av, ai = jax.lax.cond(deep > 2, slow, fast, None)
        vals_ref[:, k:] = av
        idx_ref[:, k:] = ai

        # merge running K + tile K (2K candidates) -> new running K,
        # ascending by (value, gallery index)
        cand_v = vals_ref[:]  # (TQ, 2K)
        cand_i = idx_ref[:]
        for j in range(k):
            m, sel, cand_v = _extract_min(cand_v, cand_i)
            vals_ref[:, j : j + 1] = m
            idx_ref[:, j : j + 1] = sel
        vals_ref[:, k:] = jnp.full_like(vals_ref[:, k:], BIG)
        idx_ref[:, k:] = jnp.full_like(idx_ref[:, k:], n_total)


@functools.partial(jax.jit, static_argnames=(
    "k", "tile_q", "tile_n", "interpret", "precision"))
def retrieve_fused(
    queries: jax.Array,
    gallery: jax.Array,
    pos_idx: jax.Array,
    k: int = 10,
    tile_q: int | None = None,
    tile_n: int | None = None,
    interpret: bool = False,
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(ranks, topk_sq_values, topk_indices) — euclidean (squared) metric.

    Matches :func:`art_sbir_tpu.ops.distance.retrieve` semantics including
    the torch PairwiseDistance ``eps=1e-6`` folding (values are *squared*
    eps-folded distances; take sqrt for reporting parity).

    ``precision='highest'`` runs full-f32 MXU passes for rank/tie parity
    with the XLA path. ``'default'`` streams the gallery in bfloat16 —
    half the HBM traffic and faster MXU passes at ~1e-2 relative distance
    error (top-k sets are stable; exact tie order may differ and d2pos
    comparisons shift at that scale). For repeated big-N sweeps pass the
    gallery already as bfloat16 to skip the per-call cast.

    Memory: O(Q*K) state instead of the XLA path's O(Q*N) distance matrix;
    the gallery is read ceil(Q / tile_q) times, so batch queries as large
    as VMEM allows when sweeping big galleries.
    """
    nq, d = queries.shape
    n = gallery.shape[0]
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
    eps = PAIRWISE_EPS

    q32 = queries.astype(jnp.float32)
    g32 = gallery.astype(jnp.float32)
    # expanded-form eps folding (ops/distance.py:52-75): ||q - g + eps||^2
    # = (|q|^2 + 2 eps sum q + D eps^2) + (|g|^2 - 2 eps sum g) - 2 q.g
    qq = (jnp.sum(q32 * q32, axis=1, keepdims=True)
          + 2.0 * eps * jnp.sum(q32, axis=1, keepdims=True) + d * eps * eps)
    gg_full = (jnp.sum(g32 * g32, axis=1)
               - 2.0 * eps * jnp.sum(g32, axis=1))[None, :]
    pos_c = jnp.clip(pos_idx, 0, n - 1)
    g_pos = jnp.take(g32, pos_c, axis=0)
    cross_pos = jnp.sum(q32 * g_pos, axis=1, keepdims=True)
    d2pos = jnp.maximum(
        qq + jnp.take(gg_full[0], pos_c)[:, None] - 2.0 * cross_pos, 0.0)
    pos2d = pos_idx.astype(jnp.int32)[:, None]

    if precision == "default":
        # bf16 gallery stream: half the HBM traffic, fast MXU passes.
        # no-op casts when the caller already keeps bf16 copies.
        q_in = queries.astype(jnp.bfloat16)
        g_in = gallery.astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        q_in, g_in = q32, g32
        prec = jax.lax.Precision.HIGHEST

    n_steps = -(-n // tile_n)
    q_steps = -(-nq // tile_q)
    kernel = functools.partial(_kernel, k=k, tile_q=tile_q, tile_n=tile_n,
                               nq_total=nq, n_total=n, precision=prec)
    rank2d, vals2d, idx2d = pl.pallas_call(
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
            pl.BlockSpec((tile_q, 2 * k), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 2 * k), lambda tq, tn: (tq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, 1), jnp.int32),
            jax.ShapeDtypeStruct((nq, 2 * k), jnp.float32),
            jax.ShapeDtypeStruct((nq, 2 * k), jnp.int32),
        ],
        # the default 16 MiB *scoped* vmem budget rejects f32 tiles that fit
        # comfortably in the 128 MiB physical VMEM; raise it (the axon
        # plugin rejects the XLA_FLAGS route, but Mosaic kernel params are
        # forwarded per-compile)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q_in, qq, d2pos, pos2d, g_in, gg_full)

    return rank2d[:, 0], vals2d[:, :k], idx2d[:, :k]
