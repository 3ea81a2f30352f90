"""Ablation probe: where does the fused retrieval kernel's per-grid-step
time go? Builds stripped kernel variants sharing retrieve_fused's exact
grid/BlockSpec structure and times them INTERLEAVED (the chip is
time-shared; only same-round A/B is meaningful) with min-of-rounds.

Levels:
  mm      — MXU cross-term only, one f32 reduction written per tile
  rank    — + d2full + segment loop with rank hits
  top2    — + candidate threshold/count + per-lane running top-2
  full    — the production retrieve_fused kernel
  xla     — chunked XLA baseline (retrieve_chunked)

Usage: python scripts/probe_fused_overhead.py [N] [Q] [rounds]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_sbir_tpu.core.cache import enable_compilation_cache
from art_sbir_tpu.ops.distance import retrieve_chunked
from art_sbir_tpu.ops.retrieval_pallas import BIG, retrieve_fused

TILE_Q, TILE_N = 512, 1024


def _ablate_kernel(q_ref, qq_ref, d2pos_ref, pos_ref, g_ref, gg_ref,
                   out_ref, level: int, tile_n: int, n_total: int):
    t = pl.program_id(1)
    sub = tile_n // 128

    @pl.when(t == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    cross = jax.lax.dot_general(
        q_ref[:], g_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    if level == 0:  # mm: force materialization via a cheap reduction
        out_ref[:] += jnp.sum(cross, axis=1, keepdims=True).astype(jnp.int32)
        return

    d2full = jnp.maximum(qq_ref[:] + gg_ref[:] - 2.0 * cross, 0.0)
    base = t * tile_n
    tq = cross.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    d2p = d2pos_ref[:]
    pos = pos_ref[:]
    hit_acc = jnp.zeros((tq, 128), jnp.int32)
    cnt = jnp.zeros((tq, 128), jnp.int32)
    g1 = jnp.full((tq, 128), BIG, jnp.float32)
    thresh = jnp.full((tq, 1), 1e-6, jnp.float32)  # ~never hit: isolates VPU cost
    for s in range(sub):
        colseg = base + s * 128 + lane
        d2s = jnp.where(colseg < n_total, d2full[:, s * 128:(s + 1) * 128], BIG)
        hit = (d2s < d2p) | ((d2s == d2p) & (colseg < pos))
        hit = hit & (d2s < BIG) & (colseg != pos)
        hit_acc += hit.astype(jnp.int32)
        if level >= 2:  # top2 bookkeeping
            c = jnp.where(d2s <= thresh, d2s, BIG)
            cnt += (c < BIG).astype(jnp.int32)
            better1 = c < g1
            g1 = jnp.where(better1, c, g1)
    out_ref[:] += jnp.sum(hit_acc + cnt, axis=1, keepdims=True) + (
        jnp.sum(g1, axis=1, keepdims=True) * 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("level",))
def run_ablate(q, g, qq, gg, d2pos, pos2d, level: int):
    nq, d = q.shape
    n = g.shape[0]
    kernel = functools.partial(_ablate_kernel, level=level, tile_n=TILE_N,
                               n_total=n)
    spec_q = pl.BlockSpec((TILE_Q, d), lambda tq, tn: (tq, 0),
                          memory_space=pltpu.VMEM)
    spec_c1 = pl.BlockSpec((TILE_Q, 1), lambda tq, tn: (tq, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nq // TILE_Q, n // TILE_N),
        in_specs=[spec_q, spec_c1, spec_c1, spec_c1,
                  pl.BlockSpec((TILE_N, d), lambda tq, tn: (tn, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, TILE_N), lambda tq, tn: (0, tn),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_Q, 1), lambda tq, tn: (tq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(q, qq, d2pos, pos2d, g, gg)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    enable_compilation_cache()

    key = jax.random.key(0)
    g = jax.random.normal(key, (n, 1024), jnp.bfloat16)
    q = jax.random.normal(jax.random.key(1), (nq, 1024), jnp.bfloat16)
    p = jnp.arange(nq, dtype=jnp.int32)
    qq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    gg = jnp.sum(g.astype(jnp.float32) ** 2, axis=1)[None, :]
    d2pos = jnp.full((nq, 1), 1e-9, jnp.float32)
    pos2d = p[:, None]

    def timed(fn):
        out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
        return time.perf_counter() - t0

    cfgs = {
        "mm": lambda: run_ablate(q, g, qq, gg, d2pos, pos2d, level=0),
        "rank": lambda: run_ablate(q, g, qq, gg, d2pos, pos2d, level=1),
        "top2": lambda: run_ablate(q, g, qq, gg, d2pos, pos2d, level=2),
        "full": lambda: retrieve_fused(q, g, p, k=10, precision="default",
                                       tile_q=TILE_Q, tile_n=TILE_N),
        "xla": lambda: retrieve_chunked(q.astype(jnp.float32),
                                        g.astype(jnp.float32), p, k=10,
                                        precision="default", chunk=256),
    }
    best = {k: float("inf") for k in cfgs}
    for r in range(rounds):
        for name, fn in cfgs.items():
            dt = timed(fn)
            best[name] = min(best[name], dt)
            print(f"  r{r} {name}: {dt*1e3:8.1f} ms", flush=True)
    steps = (nq // TILE_Q) * (n // TILE_N)
    print(f"\nN={n} Q={nq} grid steps={steps} (min over {rounds} rounds)")
    for name, dt in best.items():
        per = dt / steps * 1e6
        print(f"{name:5s}: {dt*1e3:8.1f} ms  = {per:6.1f} us/step")


if __name__ == "__main__":
    main()
