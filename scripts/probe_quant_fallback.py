"""Decide the int8 streaming kernel's default tile point by PRODUCTION cost.

probe_quant_sweep.py timed only the fast path: tile_n=2048/seg_reduce=16
scans 1M rows in ~31.3 ms vs the default (tile_n=1024/seg_reduce=8)
~33.7 ms, but its certificate pass rate drops 0.993 -> 0.986. The open
question (TODO.md round-4 lever) is whether the failed rows' fallback
recompute — host cert transfer + a padded XLA int8 rescan — eats the
2.4 ms. This probe times `retrieve_quantized_fused` END TO END (fallback
included, outputs pulled to host) at the 1M-row serving regime and
reports per-config wall latency + fallback row counts, so the default in
`ops/retrieval_pallas.py::quant_candidates_fused` is set by the number
that reaches users, not the kernel-only number.
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from art_sbir_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from art_sbir_tpu.ops.quant import (  # noqa: E402
    quantize_gallery, retrieve_quantized_fused, topk_overlap)
from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused_core  # noqa: E402

if not bench.tpu_reachable():
    print("TPU unreachable; aborting"); sys.exit(1)

rtt = bench.measure_rtt()
bench.log(f"RTT {rtt * 1e3:.1f} ms")

key = jax.random.key(7)
kg, kq = jax.random.split(key)
N, D, Q = bench.BIG_N, bench.DIM, bench.BIG_Q
g = jax.random.normal(kg, (N, D), jnp.float32)
# adversarially flat queries (worst case for the certificate): random
# perturbations of gallery rows, same recipe as the sweep probe
q = g[:Q] + 0.1 * jax.random.normal(kq, (Q, D), jnp.float32)
qg = quantize_gallery(g, "euclidean")
_ = np.asarray(qg.q8[0, 0])

p = jnp.arange(Q, dtype=jnp.int32)
gb = g.astype(jnp.bfloat16)
_, _, idx_ex, _ = retrieve_fused_core(q, gb, p, k=10, precision="default")
idx_ex = np.asarray(idx_ex)

CFGS = [
    ("default 1024/8", dict(tile_n=1024, seg_reduce=8, depth=4)),
    ("fast    2048/16", dict(tile_n=2048, seg_reduce=16, depth=4)),
]

for name, c in CFGS:
    def run(c=c):
        v, i = retrieve_quantized_fused(q, qg, g, k=10, **c)
        return np.asarray(v), np.asarray(i)

    vals, idx = run()  # compile both fast path and any fallback shape
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        vals, idx = run()
        ts.append(time.perf_counter() - t0)
    ov = topk_overlap(jnp.asarray(idx), jnp.asarray(idx_ex))
    bench.log(f"{name}: e2e p50={np.median(ts) * 1e3:.1f} ms "
              f"min={min(ts) * 1e3:.1f} ms overlap={ov:.4f} "
              f"(Q={Q}, N={N})")
print("done")
