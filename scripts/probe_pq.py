"""IVF-PQ on the chip: quality/speed at 600k + the 3M-row capacity demo.

Part A (``--part a``, default both): clustered 600k x 1024 gallery
resident, comparing at the serving regime (B in {1, 8, 32},
dispatch -> host pull): IVF exact-scored probe, IVF-PQ with bf16 exact
rerank, and pure IVF-PQ (rows dropped); recall@10 vs the exact path for
each.

Part B (``--part b``): the mode PQ exists for — a gallery that CANNOT be
f32-resident (3M x 1024 f32 = 12 GB > this chip's free HBM). The build
streams: blob rows are (re)generated on device chunk by chunk from a
seeded PRNG, each chunk is PQ-encoded and IVF-assigned, and only the
uint8 codes (3M x 64 = 192 MB), the cluster table and the centroids stay
resident. The exact reference for recall is computed by streaming the
same chunks through an exact scan. Resident bytes and dispatch latency
are the headline.

Usage: python scripts/probe_pq.py [--part a|b|both] [--rounds 6] [--cpu]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--part", default="both", choices=["a", "b", "both"])
p.add_argument("--n", type=int, default=600_000, help="part-A rows")
p.add_argument("--big_n", type=int, default=3_000_000, help="part-B rows")
p.add_argument("--d", type=int, default=1024)
p.add_argument("--m", type=int, default=64, help="PQ codes/row")
p.add_argument("--opq", type=int, default=0,
               help="OPQ iterations for the residual build (part A)")
p.add_argument("--rounds", type=int, default=6)
p.add_argument("--cpu", action="store_true", help="smoke on CPU backend")
p.add_argument("--skip_probe", action="store_true",
               help="caller already verified reachability (retry loops "
                    "on a flapping chip: don't burn the window re-probing)")
args = p.parse_args()

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from art_sbir_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from art_sbir_tpu.ops.distance import retrieve_chunked  # noqa: E402
from art_sbir_tpu.ops.ivf import (  # noqa: E402
    IVFIndex, _assign, build_ivf, kmeans, pack_table)
from art_sbir_tpu.ops.pq import (  # noqa: E402
    PQCodebook, build_ivf_pq, encode_pq, ivf_pq_search, train_pq)
from art_sbir_tpu.ops.quant import topk_overlap  # noqa: E402

if not args.cpu and not args.skip_probe and not bench.tpu_reachable():
    print("TPU unreachable; aborting")
    sys.exit(1)

rtt = bench.measure_rtt()
bench.log(f"RTT {rtt * 1e3:.1f} ms")
D, M = args.d, args.m


def blob_chunk(key, n_rows, n_blobs, centers):
    ka, kn = jax.random.split(key)
    assign = jax.random.randint(ka, (n_rows,), 0, n_blobs)
    return (jnp.take(centers, assign, axis=0)
            + 0.5 * jax.random.normal(kn, (n_rows, D), jnp.float32))


# --------------------------------------------------------------- part A
if args.part in ("a", "both"):
    N = args.n
    kc, kg, kq = jax.random.split(jax.random.key(17), 3)
    nb = max(4, int(np.sqrt(N)))
    centers = 4.0 * jax.random.normal(kc, (nb, D), jnp.float32)
    g = blob_chunk(kg, N, nb, centers)
    _ = np.asarray(g[0, 0])

    t0 = time.perf_counter()
    index = build_ivf(g, None)
    _ = np.asarray(index.row_ids[0, 0])
    bench.log(f"A: IVF build {time.perf_counter() - t0:.1f}s "
              f"{index.stats()}")
    t0 = time.perf_counter()
    raw_cb = train_pq(g, M)
    raw_codes = encode_pq(g, raw_cb)
    _ = np.asarray(raw_codes[0, 0])
    bench.log(f"A: raw PQ train+encode {time.perf_counter() - t0:.1f}s "
              f"(m={M}, {M} B/row)")
    t0 = time.perf_counter()
    cb, codes = build_ivf_pq(g, index, M, opq_iters=args.opq)
    _ = np.asarray(codes[0, 0])
    bench.log(f"A: residual IVF-PQ build {time.perf_counter() - t0:.1f}s"
              f"{f' (opq_iters={args.opq})' if args.opq else ''}")
    gb16 = g.astype(jnp.bfloat16)

    B_MAX = 32
    q = g[:B_MAX] + 0.1 * jax.random.normal(kq, (B_MAX, D), jnp.float32)
    _, _, exact = retrieve_chunked(q, g, jnp.zeros(B_MAX, jnp.int32),
                                   k=10, chunk=B_MAX)
    exact = np.asarray(exact)

    for tag, c_cb, c_codes, rows in (
            ("ivf exact-scored", None, None, None),
            ("raw-pq rerank-bf16", raw_cb, raw_codes, gb16),
            ("raw-pq pure", raw_cb, raw_codes, None),
            ("res-pq rerank-bf16", cb, codes, gb16),
            ("res-pq pure", cb, codes, None)):
        if c_cb is not None:
            _, ids = ivf_pq_search(q, index, c_codes, c_cb, nprobe=8,
                                   k=10, rows=rows)
        else:
            from art_sbir_tpu.ops.ivf import ivf_search
            _, ids = ivf_search(q, index, g, nprobe=8, k=10)
        bench.log(f"A: recall@10 {tag}: {topk_overlap(ids, exact):.4f}")

    # the rerank budget is the quality lever: the exact re-score is
    # O(Q*r*D) on gathered rows, so deep budgets stay cheap while the
    # ADC only needs to LAND the true top-k in its top-r
    for rf in (16, 64, 256):
        _, ids = ivf_pq_search(q, index, codes, cb, nprobe=8, k=10,
                               rows=gb16, rerank_factor=rf)
        bench.log(f"A: recall@10 res-pq rerank r={rf * 10:>4}: "
                  f"{topk_overlap(ids, exact):.4f}")

    def run(b):
        qb = q[:b]

        def ivf_route():
            from art_sbir_tpu.ops.ivf import ivf_search
            return jax.device_get(ivf_search(qb, index, g, nprobe=8, k=10))

        def pq_rerank():
            return jax.device_get(ivf_pq_search(
                qb, index, codes, cb, nprobe=8, k=10, rows=gb16))

        def pq_pure():
            return jax.device_get(ivf_pq_search(
                qb, index, codes, cb, nprobe=8, k=10))

        routes = [("ivf exact", ivf_route), ("pq+rerank", pq_rerank),
                  ("pq pure", pq_pure)]
        for _, f in routes:
            f()
        best = {t: float("inf") for t, _ in routes}
        for _ in range(args.rounds):
            for t, f in routes:
                t0 = time.perf_counter()
                f()
                best[t] = min(best[t], time.perf_counter() - t0)
        for t, _ in routes:
            bench.log(f"A: B={b:>2} {t:<10} {best[t]*1e3:7.2f} ms/dispatch")

    for b in (1, 8, 32):
        run(b)

# --------------------------------------------------------------- part B
if args.part in ("b", "both"):
    N = args.big_n
    CHUNK = min(131_072, N)
    n_chunks = -(-N // CHUNK)
    kc = jax.random.key(41)
    nb = max(4, int(np.sqrt(N)))
    centers = 4.0 * jax.random.normal(kc, (nb, D), jnp.float32)

    def chunk_rows(i, rows):
        return blob_chunk(jax.random.fold_in(jax.random.key(42), i),
                          rows, nb, centers)

    # fit IVF centroids + RESIDUAL codebooks on chunk 0 (seeded sample) —
    # the streamed form of ops/pq.py::build_ivf_pq (the gallery is never
    # materialized, so labels/residuals/codes are produced chunk-wise)
    t0 = time.perf_counter()
    sample = chunk_rows(0, CHUNK)
    nlist = max(1, int(2 * np.sqrt(N)))
    cent = kmeans(sample, nlist, iters=10)
    s_labels = _assign(sample, cent, chunk=CHUNK)
    base = train_pq(sample - jnp.take(cent, s_labels, axis=0), M,
                    metric="euclidean")
    cb = PQCodebook(base.centroids, "euclidean", True)
    del sample, s_labels
    # stream: assign + residual-encode every chunk
    codes_np = np.empty((N, M), np.uint8)
    labels_np = np.empty(N, np.int32)
    done = 0
    for i in range(n_chunks):
        rows = min(CHUNK, N - done)
        ch = chunk_rows(i, rows)
        lab = _assign(ch, cent, chunk=rows)
        codes_np[done:done + rows] = np.asarray(
            encode_pq(ch - jnp.take(cent, lab, axis=0), cb))
        labels_np[done:done + rows] = np.asarray(lab)
        done += rows
        del ch, lab
        if (i + 1) % 10 == 0 or i + 1 == n_chunks:
            bench.log(f"B: encoded {done:,}/{N:,} rows "
                      f"({time.perf_counter() - t0:.0f}s)")
    table, counts = pack_table(labels_np, nlist, N)
    index = IVFIndex(cent, jnp.asarray(table), counts, "euclidean")
    codes = jnp.asarray(codes_np)
    _ = np.asarray(codes[0, 0])
    resident = codes_np.nbytes + table.nbytes + np.asarray(cent).nbytes
    bench.log(f"B: streamed build {time.perf_counter() - t0:.1f}s — "
              f"{N:,} rows, resident {resident/1e6:.0f} MB "
              f"(codes {codes_np.nbytes/1e6:.0f} + table "
              f"{table.nbytes/1e6:.0f} + centroids "
              f"{np.asarray(cent).nbytes/1e6:.0f}); f32 gallery would be "
              f"{N*D*4/1e9:.1f} GB")
    bench.log(f"B: {index.stats()}")

    # queries near known rows of a mid-stream chunk
    B = 8
    base = chunk_rows(min(3, n_chunks - 1), CHUNK)[:B]
    q = base + 0.1 * jax.random.normal(jax.random.key(7), (B, D),
                                       jnp.float32)
    del base

    # exact reference by streaming the same chunks through an exact scan
    t0 = time.perf_counter()
    best_v = np.full((B, 10), np.inf, np.float32)
    best_i = np.full((B, 10), -1, np.int64)
    done = 0
    for i in range(n_chunks):
        rows = min(CHUNK, N - done)
        ch = chunk_rows(i, rows)
        _, v, idx = retrieve_chunked(q, ch, jnp.zeros(B, jnp.int32),
                                     k=10, chunk=B)
        v, idx = np.asarray(v), np.asarray(idx) + done
        allv = np.concatenate([best_v, v], axis=1)
        alli = np.concatenate([best_i, idx], axis=1)
        order = np.argsort(allv, axis=1, kind="stable")[:, :10]
        best_v = np.take_along_axis(allv, order, axis=1)
        best_i = np.take_along_axis(alli, order, axis=1)
        done += rows
        del ch
    bench.log(f"B: streamed exact reference {time.perf_counter()-t0:.1f}s")

    for nprobe in (4, 8, 16):
        vals, ids = ivf_pq_search(q, index, codes, cb, nprobe=nprobe, k=10)
        r10 = topk_overlap(ids, best_i)
        r1 = float(np.mean(np.asarray(ids)[:, 0] == best_i[:, 0]))
        bench.log(f"B: pure-PQ recall nprobe={nprobe:>2}: @1 {r1:.4f} "
                  f"@10 {r10:.4f}")

    def disp():
        return jax.device_get(ivf_pq_search(q, index, codes, cb,
                                            nprobe=8, k=10))

    disp()
    best = float("inf")
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        disp()
        best = min(best, time.perf_counter() - t0)
    bench.log(f"B: pure-PQ dispatch (B={B}, nprobe=8, {N:,} rows): "
              f"{best*1e3:.2f} ms")

print("done")
