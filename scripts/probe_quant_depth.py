"""Pick retrieve_quantized_fused's default (depth, r) by e2e cost at 1M.

probe_quant_stages.py showed the depth=4 certificate collapses at r=80
(~7% of adversarial rows fail -> a 512-query padded XLA rescan whose
lax.top_k over 1M rows serializes ~100 ms). The engine regime is r=40
(rerank_factor=4), where depth=4 holds 0.9936. This probe times the
candidate configs end to end plus the fallback rescan at both pad sizes,
to encode an auto depth rule."""
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
    _symmetric_quantize, quantize_gallery, retrieve_quantized,
    retrieve_quantized_fused, topk_overlap)
from art_sbir_tpu.ops.retrieval_pallas import (  # noqa: E402
    quant_candidates_fused, retrieve_fused_core)

if not bench.tpu_reachable():
    print("TPU unreachable; aborting"); sys.exit(1)

rtt = bench.measure_rtt()
bench.log(f"RTT {rtt * 1e3:.1f} ms")

key = jax.random.key(7)
kg, kq = jax.random.split(key)
N, D, Q = bench.BIG_N, bench.DIM, bench.BIG_Q
g = jax.random.normal(kg, (N, D), jnp.float32)
q = g[:Q] + 0.1 * jax.random.normal(kq, (Q, D), jnp.float32)
p = jnp.arange(Q, dtype=jnp.int32)
gb = g.astype(jnp.bfloat16)
qg = quantize_gallery(g, "euclidean")
_ = np.asarray(qg.q8[0, 0])

_, _, idx_ex, _ = retrieve_fused_core(q, gb, p, k=10, precision="default")
idx_ex = np.asarray(idx_ex)


def wall(fn, reps=6):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(min(ts)), out


for name, kw in [("d4 rf4 (engine)", dict(depth=4, rerank_factor=4)),
                 ("d8 rf4", dict(depth=8, rerank_factor=4)),
                 ("d4 rf8", dict(depth=4, rerank_factor=8)),
                 ("d8 rf8", dict(depth=8, rerank_factor=8))]:
    def run(kw=kw):
        v, i = retrieve_quantized_fused(q, qg, g, k=10, **kw)
        return jax.device_get((v, i))

    p50, mn, (v, i) = wall(run)
    ov = topk_overlap(jnp.asarray(i), jnp.asarray(idx_ex))
    bench.log(f"int8 e2e {name}: p50={p50*1e3:7.1f} ms min={mn*1e3:7.1f} ms "
              f"overlap={ov:.4f}")

# depth=8 scan device-only (chained) at both r
for r, depth in [(40, 4), (40, 8), (80, 8)]:
    def scan_only(qq, r=r, depth=depth):
        q8x, sqx = _symmetric_quantize(qq)
        _, cand, _ = quant_candidates_fused(
            q8x, sqx, qg.q8, qg.scale, qg.sq_norm, r=r,
            metric="euclidean", depth=depth)
        return cand

    t = min(bench.honest_timeit(scan_only, q, 2, rtt) for _ in range(3))
    bench.log(f"scan device d{depth} r{r}: {t*1e3:7.1f} ms")

# fallback rescan cost vs padded batch (device-only)
for qb in (32, 128, 512):
    def fb(qq):
        v, i = retrieve_quantized(qq, qg, g, k=10, rerank_factor=4)
        return v

    t = min(bench.honest_timeit(fb, q[:qb], 2, rtt) for _ in range(3))
    bench.log(f"fallback XLA rescan Q={qb}: {t*1e3:7.1f} ms")
print("done")
