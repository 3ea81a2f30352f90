"""Fused Pallas retrieval kernel: pairwise-L2 + rank-of-positive + top-k in
one pass over an HBM-resident gallery.

The XLA formulation (:mod:`art_sbir_tpu.ops.distance`) materializes the
(Q, N) distance matrix in HBM; this kernel streams gallery tiles through
VMEM once and keeps only (Q, K) running top-k state + (Q,) rank counters —
the op becomes purely gallery-bandwidth-bound (N*D*4 bytes read once), the
speed-of-light for single-pass retrieval, independent of Q's distance-matrix
footprint.

Per grid step over gallery tiles of TN rows:
  d2 block   = |q|^2 + |g|^2 - 2 q g^T          (MXU, f32 accum)
  rank count+= #(d2 < d2_pos) + index-ties      (VPU reduction)
  top-k      = K-round min-extract merge of the tile into the running
               (Q, K) state                      (VPU)

``d2_pos`` (squared distance to each query's positive) is computed outside
— one (Q, D) elementwise row op.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38  # "worse than any distance" sentinel for min-based top-k


def _kernel(q_ref, qq_ref, d2pos_ref, pos_ref, g_ref, gg_ref,
            rank_ref, vals_ref, idx_ref, k: int, tile_n: int, n_total: int,
            precision):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        rank_ref[:] = jnp.zeros_like(rank_ref)
        vals_ref[:] = jnp.full_like(vals_ref, BIG)
        idx_ref[:] = jnp.full_like(idx_ref, n_total)

    q = q_ref[:]  # (Q, D)
    g = g_ref[:]  # (TN, D)
    qq = qq_ref[:]  # (Q, 1)
    gg = gg_ref[:]  # (1, TN)

    cross = jax.lax.dot_general(
        q, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )  # (Q, TN)
    d2 = jnp.maximum(qq + gg - 2.0 * cross, 0.0)

    base = t * tile_n
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + base
    in_bounds = col < n_total
    d2 = jnp.where(in_bounds, d2, BIG)

    # rank: strictly closer, plus exact ties at a smaller gallery index.
    # the positive's own column is excluded explicitly — its in-kernel MXU
    # distance may round differently than the externally computed d2pos,
    # and the positive must never count toward its own rank.
    d2p = d2pos_ref[:]  # (Q, 1)
    pos = pos_ref[:]  # (Q, 1) int32
    hit = (d2 < d2p) | ((d2 == d2p) & (col < pos))
    hit = hit & in_bounds & (col != pos)
    rank_ref[:] += jnp.sum(hit.astype(jnp.int32), axis=1, keepdims=True)

    # min-extraction helper without gathers (Mosaic-lowerable): select the
    # minimum's column index via masked reductions; ties resolve to the
    # smallest position (stable first-occurrence order).
    def extract_min(values, indices):
        m = jnp.min(values, axis=1, keepdims=True)  # (Q, 1)
        pos_iota = jax.lax.broadcasted_iota(jnp.int32, values.shape, 1)
        posm = jnp.min(
            jnp.where(values == m, pos_iota, values.shape[1]), axis=1,
            keepdims=True,
        )
        picked = pos_iota == posm
        sel = jnp.sum(jnp.where(picked, indices, 0), axis=1, keepdims=True)
        remaining = jnp.where(picked, BIG, values)
        return m, sel, remaining

    # extract the K smallest of this tile into the upper K slots
    work = d2
    wcol = col
    for j in range(k):
        m, sel, work = extract_min(work, wcol)
        vals_ref[:, k + j : k + j + 1] = m
        idx_ref[:, k + j : k + j + 1] = sel

    # merge running K + tile K (2K candidates) -> new running K, ascending
    cand_v = vals_ref[:]  # (Q, 2K)
    cand_i = idx_ref[:]
    for j in range(k):
        m, sel, cand_v = extract_min(cand_v, cand_i)
        vals_ref[:, j : j + 1] = m
        idx_ref[:, j : j + 1] = sel
    vals_ref[:, k:] = jnp.full_like(vals_ref[:, k:], BIG)
    idx_ref[:, k:] = jnp.full_like(idx_ref[:, k:], n_total)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret", "precision"))
def retrieve_fused(
    queries: jax.Array,
    gallery: jax.Array,
    pos_idx: jax.Array,
    k: int = 10,
    tile_n: int = 1024,
    interpret: bool = False,
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(ranks, topk_sq_values, topk_indices) — euclidean (squared) metric.

    Matches :func:`art_sbir_tpu.ops.distance.retrieve` semantics (with
    squared-distance values; take sqrt for reporting parity).
    ``precision='highest'`` matches the XLA path's f32 MXU passes for
    rank/tie parity; ``'default'`` uses bf16 MXU passes — ~3x faster on the
    matmul-bound regime at ~1e-2 relative distance error (top-k sets are
    stable; exact tie order may differ).
    """
    q = queries.astype(jnp.float32)
    g = gallery.astype(jnp.float32)
    nq, d = q.shape
    n = g.shape[0]
    tile_n = min(tile_n, max(128, n))

    qq = jnp.sum(q * q, axis=1, keepdims=True)
    gg_full = jnp.sum(g * g, axis=1)
    d_pos = jnp.take(g, jnp.clip(pos_idx, 0, n - 1), axis=0)
    d2pos = jnp.sum(jnp.square(q - d_pos), axis=1, keepdims=True)

    pad_n = (-n) % tile_n
    g_p = jnp.pad(g, ((0, pad_n), (0, 0)))
    gg_p = jnp.pad(gg_full, (0, pad_n))[None, :]
    steps = (n + pad_n) // tile_n

    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_kernel, k=k, tile_n=tile_n, n_total=n,
                               precision=prec)
    rank2d, vals2d, idx2d = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((nq, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nq, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 2 * k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 2 * k), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, 1), jnp.int32),
            jax.ShapeDtypeStruct((nq, 2 * k), jnp.float32),
            jax.ShapeDtypeStruct((nq, 2 * k), jnp.int32),
        ],
        interpret=interpret,
    )(q, qq, d2pos, pos_idx.astype(jnp.int32)[:, None], g_p, gg_p)

    return rank2d[:, 0], vals2d[:, :k], idx2d[:, :k]
