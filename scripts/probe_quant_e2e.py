"""Break down the int8 serving path's END-TO-END latency at 1M rows.

probe_quant_fallback.py found retrieve_quantized_fused e2e ~270 ms while
the candidate scan alone is ~33 ms. This probe locates the other ~240 ms
(rerank device time? host round-trips? the certificate-fallback rescan?)
and times the bf16 fused path e2e the same way, so the serving engine's
quantize routing is justified by the number a client sees, not the
kernel-only sweep.

Stages timed:
  bf16 e2e   : retrieve_fused(..., precision='default', with_ranks=False)
               + host pull of (vals, idx)
  int8 e2e   : retrieve_quantized_fused(...) + host pull
  int8 scan  : quant_candidates_fused device-only (honest chained timing)
  int8 rerank: _rerank_jit device-only on a fixed candidate set
  int8 nofb  : e2e with depth=8 (certificate ~always passes -> no
               fallback dispatch), isolating the fallback's cost
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
    _rerank_jit, _symmetric_quantize, quantize_gallery,
    retrieve_quantized_fused)
from art_sbir_tpu.ops.retrieval_pallas import (  # noqa: E402
    quant_candidates_fused, retrieve_fused)

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


def wall(fn, reps=6):
    fn()  # compile / warm every shape incl. fallback
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(min(ts))


# --- bf16 fused, serving form (no ranks), e2e incl host pull
def bf16_e2e():
    _, v, i = retrieve_fused(q, gb, p, k=10, precision="default",
                             with_ranks=False)
    return jax.device_get((v, i))

p50, mn = wall(bf16_e2e)
bench.log(f"bf16 fused e2e     : p50={p50*1e3:7.1f} ms  min={mn*1e3:7.1f} ms")

# --- int8 e2e (default tile point)
def int8_e2e():
    v, i = retrieve_quantized_fused(q, qg, g, k=10)
    return jax.device_get((v, i))

p50, mn = wall(int8_e2e)
bench.log(f"int8 e2e (depth=4) : p50={p50*1e3:7.1f} ms  min={mn*1e3:7.1f} ms")

# --- int8 e2e with depth=8 (cert ~always passes: no fallback dispatch)
def int8_e2e_d8():
    v, i = retrieve_quantized_fused(q, qg, g, k=10, depth=8)
    return jax.device_get((v, i))

p50, mn = wall(int8_e2e_d8)
bench.log(f"int8 e2e (depth=8) : p50={p50*1e3:7.1f} ms  min={mn*1e3:7.1f} ms")

# --- device-only stages (honest chained timing)
q8, s_q = _symmetric_quantize(q)
q8 = jax.block_until_ready(q8)

def scan_only(qq):
    q8x, sqx = _symmetric_quantize(qq)
    _, cand, cert = quant_candidates_fused(
        q8x, sqx, qg.q8, qg.scale, qg.sq_norm, r=80, metric="euclidean")
    return cand

t = min(bench.honest_timeit(scan_only, q, 2, rtt) for _ in range(3))
bench.log(f"int8 scan device   : {t*1e3:7.1f} ms (r=80)")

_, cand0, _ = quant_candidates_fused(
    q8, s_q, qg.q8, qg.scale, qg.sq_norm, r=80, metric="euclidean")
cand0 = jnp.sort(cand0, axis=1)
_ = np.asarray(cand0[0, 0])

def rerank_only(qq):
    v, i = _rerank_jit(qq, cand0, g, metric="euclidean", k=10)
    return v

t = min(bench.honest_timeit(rerank_only, q, 2, rtt) for _ in range(3))
bench.log(f"int8 rerank device : {t*1e3:7.1f} ms (R=80)")

# fallback rescan shape cost: the padded XLA int8 scan at Q=64
from art_sbir_tpu.ops.quant import retrieve_quantized  # noqa: E402
q64 = q[:64]

def fb_only(qq):
    v, i = retrieve_quantized(qq, qg, g, k=10)
    return v

t = min(bench.honest_timeit(fb_only, q64, 2, rtt) for _ in range(3))
bench.log(f"fallback XLA scan  : {t*1e3:7.1f} ms (Q=64 padded shape)")
print("done")
