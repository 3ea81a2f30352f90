"""Feasibility + quality study for an int4 candidate scan (round-4 lever).

FEASIBILITY (measured): jnp.int4 is NOT compilable through the axon
remote compiler — even `astype(jnp.int4)` kills the tpu_compile_helper
subprocess (HTTP 500), surfacing as a RecursionError from the plugin's
retry path. The 2x-MXU-rate / 8x-capacity lever is dead on this backend;
re-probe on a TPU VM with a local libtpu before any kernel work.

QUALITY (dtype-independent, so measurable anyway): simulate int4 with an
int8 carrier clipped to +-7 (15 levels, the exact value lattice a real
int4 scan would see) and measure top-10 overlap after the exact rerank
vs the exact bf16 fused kernel, against the real int8 path at the same
rerank budgets. This answers whether int4 would even be worth a kernel
on a backend that supports it.
"""
import sys

sys.path.insert(0, ".")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from art_sbir_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from art_sbir_tpu.ops.quant import (  # noqa: E402
    _rerank_jit, quantize_gallery, retrieve_quantized_fused, topk_overlap)
from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused_core  # noqa: E402

if not bench.tpu_reachable():
    print("TPU unreachable; aborting"); sys.exit(1)

rtt = bench.measure_rtt()
bench.log(f"RTT {rtt * 1e3:.1f} ms")

key = jax.random.key(7)
kg, kq = jax.random.split(key)
# leaner than the bench 1M regime: the first run at 1M died silently on
# the chip (HBM pressure: f32+bf16+int8 galleries + (512, N) score temps
# + top_k sort workspace); 500k x 1024 queries keeps every live buffer
# comfortable and the quality statistics are about quantization noise vs
# neighbor margins, not absolute N
N, D, Q = 500_000, bench.DIM, 1024
g = jax.random.normal(kg, (N, D), jnp.float32)
gb = g.astype(jnp.bfloat16)
gsq = jnp.sum(g * g, axis=1)
qg8 = quantize_gallery(g, "euclidean")


def quantize_sim4(rows):
    """15-level symmetric quantization on an int8 carrier."""
    scale = jnp.maximum(jnp.max(jnp.abs(rows), axis=1), 1e-12) / 7.0
    q4 = jnp.clip(jnp.round(rows / scale[:, None]), -7, 7)
    return q4.astype(jnp.int8), scale


g4, sc4 = quantize_sim4(g)


@jax.jit
def scan4_chunk(qc, g4, sc4, gsq):
    # galleries passed as ARGUMENTS: closing over them bakes them into
    # the HLO as constants and the remote compiler rejects the request
    # body (HTTP 413) — the failure mode that silently killed run 1
    q4, s_q = quantize_sim4(qc)
    dot = jax.lax.dot_general(
        q4, g4, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (s_q[:, None] * sc4[None, :])
    approx = gsq[None, :] - 2.0 * dot
    _, cand = jax.lax.top_k(-approx, 320)
    return cand


corpora = [("flat (row+0.1n)",
            g[:Q] + 0.1 * jax.random.normal(kq, (Q, D))),
           ("separated (row+0.01n)",
            g[:Q] + 0.01 * jax.random.normal(kq, (Q, D)))]

# exact baselines first, then free the bf16 gallery copy
p = jnp.arange(Q, dtype=jnp.int32)
baselines = {}
for corpus, qx in corpora:
    _, _, idx_ex, _ = retrieve_fused_core(qx, gb, p, k=10,
                                          precision="default")
    baselines[corpus] = jnp.asarray(np.asarray(idx_ex))
del gb

for corpus, qx in corpora:
    idx_ex = baselines[corpus]
    # real int8 path at the default budget, for reference
    _, idx8 = retrieve_quantized_fused(qx, qg8, g, k=10, rerank_factor=4)
    bench.log(f"int8 r=40 {corpus}: overlap="
              f"{topk_overlap(jnp.asarray(np.asarray(idx8)), idx_ex):.4f}")

    # simulated-int4 candidates at increasing budgets, exact rerank
    cand = np.concatenate(
        [np.asarray(scan4_chunk(qx[i:i + 256], g4, sc4, gsq))
         for i in range(0, Q, 256)])
    for r in (40, 80, 160, 320):
        c = jnp.sort(jnp.asarray(cand[:, :r]), axis=1)
        _, idx4 = _rerank_jit(qx, c, g, metric="euclidean", k=10)
        ov = topk_overlap(jnp.asarray(np.asarray(idx4)), idx_ex)
        bench.log(f"sim-int4 r={r} {corpus}: overlap={ov:.4f}")
print("done")
