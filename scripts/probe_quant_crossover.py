"""Locate the int8 XLA-scan vs streamed-kernel crossover.

The serving engine routes quantized galleries through the streamed
kernel past FUSED_GALLERY_THRESHOLD (50k) — a threshold measured on the
bf16 fused kernel vs the XLA f32 path, BORROWED for the int8 route.
This probe times the two int8 implementations end to end (device_get,
engine regime: Q=512, k=10, rerank_factor=4) across gallery sizes to
check the borrow is sound for the route that actually uses it."""
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
    quantize_gallery, retrieve_quantized, retrieve_quantized_fused)

if not bench.tpu_reachable():
    print("TPU unreachable; aborting"); sys.exit(1)

rtt = bench.measure_rtt()
bench.log(f"RTT {rtt * 1e3:.1f} ms")
D, Q = bench.DIM, 512
key = jax.random.key(5)

for N in (25_000, 50_000, 100_000, 200_000, 400_000):
    kg, kq = jax.random.split(jax.random.key(N))
    g = jax.random.normal(kg, (N, D), jnp.float32)
    q = g[:Q] + 0.1 * jax.random.normal(kq, (Q, D), jnp.float32)
    qg = quantize_gallery(g, "euclidean")
    _ = np.asarray(qg.q8[0, 0])

    def xla():
        v, i = retrieve_quantized(q, qg, g, k=10, rerank_factor=4)
        return jax.device_get((v, i))

    def kern():
        return retrieve_quantized_fused(q, qg, g, k=10, rerank_factor=4,
                                        device_get=True)

    for f in (xla, kern):
        f()  # compile/warm
    tx, tk = float("inf"), float("inf")
    for _ in range(6):  # interleaved (time-shared chip)
        t0 = time.perf_counter(); xla(); tx = min(tx, time.perf_counter() - t0)
        t0 = time.perf_counter(); kern(); tk = min(tk, time.perf_counter() - t0)
    bench.log(f"N={N:>7,}: xla {tx*1e3:6.1f} ms | kernel {tk*1e3:6.1f} ms "
              f"| kernel speedup {tx/tk:4.2f}x")
print("done")
