"""Stage-level timing of retrieve_quantized_fused's fallback path (depth=4)
at the 1M-row serving regime: after the device-side-merge fix, depth=8
(no fallback) runs ~139 ms e2e but depth=4 (fallback ~1% of rows) stays at
~243 ms. Replicates the wrapper body with host timestamps after each
dispatch/sync to find the serial ~100 ms."""
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
    _rerank_jit, _symmetric_quantize, quantize_gallery, retrieve_quantized)
from art_sbir_tpu.ops.retrieval_pallas import quant_candidates_fused  # noqa: E402

if not bench.tpu_reachable():
    print("TPU unreachable; aborting"); sys.exit(1)

rtt = bench.measure_rtt()
bench.log(f"RTT {rtt * 1e3:.1f} ms")

key = jax.random.key(7)
kg, kq = jax.random.split(key)
N, D, Q = bench.BIG_N, bench.DIM, bench.BIG_Q
g = jax.random.normal(kg, (N, D), jnp.float32)
q = g[:Q] + 0.1 * jax.random.normal(kq, (Q, D), jnp.float32)
qg = quantize_gallery(g, "euclidean")
_ = np.asarray(qg.q8[0, 0])
k, r = 10, 80


def staged():
    ts = {}
    t0 = time.perf_counter()
    qf = jnp.asarray(q, jnp.float32)
    q8, s_q = _symmetric_quantize(qf)
    _, cand, cert = quant_candidates_fused(
        q8, s_q, qg.q8, qg.scale, qg.sq_norm, r=r, metric="euclidean",
        depth=4)
    ts["scan dispatch"] = time.perf_counter() - t0

    t = time.perf_counter()
    cand = jnp.sort(cand, axis=1)
    vals, idx = _rerank_jit(qf, cand, g, metric="euclidean", k=k)
    ts["rerank dispatch"] = time.perf_counter() - t

    t = time.perf_counter()
    cert_h = np.asarray(cert)
    ts["cert sync"] = time.perf_counter() - t

    t = time.perf_counter()
    bad = np.nonzero(cert_h == 0)[0]
    nbad = len(bad)
    pad = 1 << (nbad - 1).bit_length() if nbad > 1 else 1
    pad = min(pad, qf.shape[0])
    sel = np.pad(bad, (0, pad - nbad), mode="edge")
    qsel = jnp.take(q, sel, axis=0)
    ts["take dispatch"] = time.perf_counter() - t

    t = time.perf_counter()
    vb, ib = retrieve_quantized(qsel, qg, g, k=k)
    ts["fallback dispatch"] = time.perf_counter() - t

    t = time.perf_counter()
    vals = vals.at[bad].set(vb[:nbad])
    idx = idx.at[bad].set(ib[:nbad])
    ts["scatter dispatch"] = time.perf_counter() - t

    t = time.perf_counter()
    out = jax.device_get((vals, idx))
    ts["final sync"] = time.perf_counter() - t
    ts["TOTAL"] = time.perf_counter() - t0
    return ts, nbad


staged()  # warm/compile
for rep in range(3):
    ts, nbad = staged()
    bench.log(f"rep {rep} (nbad={nbad}): " + "  ".join(
        f"{name}={v * 1e3:.1f}ms" for name, v in ts.items()))
print("done")
