"""Measure the segment fold + with_ranks levers on the EXACT fused kernel
at the 1M-row regime (bf16 stream, k=10), with certificate health."""
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

ref = None
for red in (1, 4, 8, 16):
    for wr in (True, False):
        def run(qq, red=red, wr=wr):
            return retrieve_fused_core(qq, gb, p, k=10, precision="default",
                                       seg_reduce=red, with_ranks=wr)[1]
        t = float("inf")
        for _ in range(3):
            t = min(t, bench.honest_timeit(run, q, 2, rtt))
        r, v, i, e = retrieve_fused_core(q, gb, p, k=10, precision="default",
                                         seg_reduce=red, with_ranks=wr)
        cf = float(np.asarray(e).mean())
        i = np.asarray(i)
        if ref is None:
            ref = i
            match = "ref"
        else:
            match = f"idx_match={np.mean(i == ref):.4f}"
        bench.log(f"red={red} with_ranks={wr}: {t*1e3:.1f} ms "
                  f"({bench.BIG_Q/t:,.0f} qps) cert={cf:.4f} {match}")
print("done")
