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
N, D, Q = bench.BIG_N, bench.DIM, bench.BIG_Q
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
def scan4_chunk(qc):
    q4, s_q = quantize_sim4(qc)
    dot = jax.lax.dot_general(
        q4, g4, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (s_q[:, None] * sc4[None, :])
    approx = gsq[None, :] - 2.0 * dot
    _, cand = jax.lax.top_k(-approx, 320)
    return cand


for corpus, qx in [("flat (row+0.1n)",
                    g[:Q] + 0.1 * jax.random.normal(kq, (Q, D))),
                   ("separated (row+0.01n)",
                    g[:Q] + 0.01 * jax.random.normal(kq, (Q, D)))]:
    p = jnp.arange(Q, dtype=jnp.int32)
    _, _, idx_ex, _ = retrieve_fused_core(qx, gb, p, k=10,
                                          precision="default")
    idx_ex = jnp.asarray(np.asarray(idx_ex))

    # real int8 path at the default budget, for reference
    _, idx8 = retrieve_quantized_fused(qx, qg8, g, k=10, rerank_factor=4)
    bench.log(f"int8 r=40 {corpus}: overlap="
              f"{topk_overlap(jnp.asarray(np.asarray(idx8)), idx_ex):.4f}")

    # simulated-int4 candidates at increasing budgets, exact rerank
    cand = jnp.concatenate(
        [scan4_chunk(qx[i:i + 512]) for i in range(0, Q, 512)])
    for r in (40, 80, 160, 320):
        c = jnp.sort(cand[:, :r], axis=1)
        _, idx4 = _rerank_jit(qx, c, g, metric="euclidean", k=10)
        ov = topk_overlap(jnp.asarray(np.asarray(idx4)), idx_ex)
        bench.log(f"sim-int4 r={r} {corpus}: overlap={ov:.4f}")
print("done")
