"""Tile-size sweep for the EXACT bf16 fused kernel at the 1M-row regime.

Motivation: at N=1M, D=1024, Q=4096 the kernel's theoretical bf16 MXU
bound is 2*Q*N*D / 197 TFLOP/s = 42.6 ms; the shipped default tiles
(tile_q=512, tile_n=1024) measured 58.5 ms (~73% of peak) after the
segment fold. The int8 sweep (probe_quant_sweep.py) found tile_n=4096
helped its scan; this probe asks whether the exact kernel has the same
lever. VMEM headroom allows 4x larger tiles (per-step buffers at
(1024, 2048): 8 MB f32 distances + 4 MB bf16 gallery tile, vs ~128 MB).
"""
import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
import bench
from art_sbir_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused_core

rtt = bench.measure_rtt()
bench.log(f"RTT {rtt*1e3:.1f} ms")
key = jax.random.key(7)
kg, kq = jax.random.split(key)
N, D, Q = bench.BIG_N, bench.DIM, bench.BIG_Q
g = jax.random.normal(kg, (N, D), jnp.float32)
q = g[:Q] + 0.1 * jax.random.normal(kq, (Q, D), jnp.float32)
p = jnp.arange(Q, dtype=jnp.int32)
gb = g.astype(jnp.bfloat16)
_ = np.asarray(gb[0, 0])

CONFIGS = [
    (512, 1024),   # shipped default
    (512, 2048),
    (512, 4096),
    (1024, 1024),
    (1024, 2048),
    (256, 2048),
]

ref = np.asarray(retrieve_fused_core(q, gb, p, k=10, precision="default",
                                     with_ranks=False)[2])
results = {}
# Interleave configs across rounds (time-shared chip, CLAUDE.md).
for rnd in range(3):
    for tq, tn in CONFIGS:
        def run(qq, tq=tq, tn=tn):
            return retrieve_fused_core(qq, gb, p, k=10, precision="default",
                                       tile_q=tq, tile_n=tn,
                                       with_ranks=False)[1]
        t = bench.honest_timeit(run, q, 2, rtt)
        results[(tq, tn)] = min(results.get((tq, tn), float("inf")), t)
        bench.log(f"round {rnd} tq={tq} tn={tn}: {t*1e3:.1f} ms")

for (tq, tn), t in sorted(results.items(), key=lambda kv: kv[1]):
    r, v, i, e = retrieve_fused_core(q, gb, p, k=10, precision="default",
                                     tile_q=tq, tile_n=tn, with_ranks=False)
    cf = float(np.asarray(e).mean())
    i = np.asarray(i)
    bench.log(f"tq={tq} tn={tn}: min {t*1e3:.1f} ms ({Q/t:,.0f} qps) "
              f"cert={cf:.4f} idx_match={np.mean(i == ref):.4f}")
print("done")
