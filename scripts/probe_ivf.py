"""IVF vs full-scan routes at the SERVING regime (small coalesced batches).

The serving engine dispatches coalesced micro-batches of ~1-32 queries
(measured mean ~4, PERF.md); every full-scan route reads the whole N*D
resident gallery per dispatch, while the IVF probe gathers
B*nprobe*Cpad candidate rows — independent of N. This probe measures
that trade on the chip, end to end the way the engine sees it
(dispatch -> host pull of (vals, idx)):

* routes: fused bf16 exact stream (the engine's >=50k route),
  int8 streamed scan + exact rerank (the >=500k route), and
  ivf_search at nprobe in {4, 8, 16};
* B in {1, 4, 8, 32} queries per dispatch;
* recall@10 vs the exact path for every IVF config (perturbed-row
  queries AND adversarially flat queries), plus cluster-balance stats
  and the on-chip build time.

Usage: python scripts/probe_ivf.py [--n 600000] [--rounds 6] [--cpu]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--n", type=int, default=600_000)
p.add_argument("--d", type=int, default=1024)
p.add_argument("--nlist", type=int, default=0, help="0 = auto 2*sqrt(N)")
p.add_argument("--rounds", type=int, default=6)
p.add_argument("--cpu", action="store_true", help="smoke on CPU backend")
p.add_argument("--clustered", action="store_true",
               help="blob-structured gallery (realistic embedding "
                    "geometry) instead of the adversarial flat gaussian")
args = p.parse_args()

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from art_sbir_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from art_sbir_tpu.ops.ivf import build_ivf, ivf_search  # noqa: E402
from art_sbir_tpu.ops.quant import (  # noqa: E402
    quantize_gallery, retrieve_quantized_fused, topk_overlap)
from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused  # noqa: E402
from art_sbir_tpu.ops.distance import retrieve_chunked  # noqa: E402

if not args.cpu and not bench.tpu_reachable():
    print("TPU unreachable; aborting")
    sys.exit(1)

rtt = bench.measure_rtt()
bench.log(f"RTT {rtt * 1e3:.1f} ms")
N, D = args.n, args.d
kg, kq = jax.random.split(jax.random.key(17))
if args.clustered:
    # blob geometry: real image-embedding galleries concentrate around
    # semantic modes; IVF's recall contract is written for this case
    n_blobs = max(4, int(np.sqrt(N)))
    kc, ka, kn = jax.random.split(kg, 3)
    centers = 4.0 * jax.random.normal(kc, (n_blobs, D), jnp.float32)
    assign = jax.random.randint(ka, (N,), 0, n_blobs)
    g = (jnp.take(centers, assign, axis=0)
         + 0.5 * jax.random.normal(kn, (N, D), jnp.float32))
else:
    g = jax.random.normal(kg, (N, D), jnp.float32)
_ = np.asarray(g[0, 0])

t0 = time.perf_counter()
index = build_ivf(g, args.nlist or None)
_ = np.asarray(index.row_ids[0, 0])
bench.log(f"IVF build: {time.perf_counter() - t0:.1f}s  {index.stats()}")

qg = quantize_gallery(g, "euclidean")
_ = np.asarray(qg.q8[0, 0])

# query sets: near-row (realistic) for recall + timing; flat for
# adversarial recall
B_MAX = 32
q_near = g[:B_MAX] + 0.1 * jax.random.normal(kq, (B_MAX, D), jnp.float32)
q_flat = jax.random.normal(jax.random.key(23), (B_MAX, D), jnp.float32)

# exact reference top-10 for recall (chunked XLA, f32-highest)
_, _, exact_near = retrieve_chunked(q_near, g, jnp.zeros(B_MAX, jnp.int32),
                                    k=10, chunk=B_MAX)
_, _, exact_flat = retrieve_chunked(q_flat, g, jnp.zeros(B_MAX, jnp.int32),
                                    k=10, chunk=B_MAX)
exact_near, exact_flat = np.asarray(exact_near), np.asarray(exact_flat)

NPROBES = (4, 8, 16)
for nprobe in NPROBES:
    _, ids_n = ivf_search(q_near, index, g, nprobe=nprobe, k=10)
    _, ids_f = ivf_search(q_flat, index, g, nprobe=nprobe, k=10)
    r1 = float(np.mean(np.asarray(ids_n)[:, 0] == exact_near[:, 0]))
    bench.log(f"recall nprobe={nprobe:>2}: @1 near {r1:.4f} | @10 near "
              f"{topk_overlap(ids_n, exact_near):.4f} | @10 flat "
              f"{topk_overlap(ids_f, exact_flat):.4f} | candidates/query "
              f"{nprobe * index.pad_width:,}")

pos = jnp.zeros(B_MAX, jnp.int32)


def run_all(b):
    q = q_near[:b]

    def fused_bf16():
        _, v, i = retrieve_fused(q, g, pos[:b], k=10, with_ranks=False,
                                 device_get=True)
        return v, i

    def int8():
        return retrieve_quantized_fused(q, qg, g, k=10, rerank_factor=4,
                                        device_get=True)

    routes = [("fused bf16", fused_bf16), ("int8+rerank", int8)]
    for nprobe in NPROBES:
        def ivf(nprobe=nprobe):
            v, i = ivf_search(q, index, g, nprobe=nprobe, k=10)
            return jax.device_get((v, i))

        routes.append((f"ivf p={nprobe:>2}", ivf))

    for _, f in routes:
        f()  # warm/compile
    best = {tag: float("inf") for tag, _ in routes}
    for _ in range(args.rounds):  # interleaved (time-shared chip)
        for tag, f in routes:
            t0 = time.perf_counter()
            f()
            best[tag] = min(best[tag], time.perf_counter() - t0)
    base = best["fused bf16"]
    for tag, _ in routes:
        bench.log(f"B={b:>2} {tag:<12} {best[tag] * 1e3:7.2f} ms/dispatch "
                  f"({b / best[tag]:8,.0f} qps) | vs fused "
                  f"{base / best[tag]:5.2f}x")


for b in (1, 4, 8, 32):
    run_all(b)
print("done")
