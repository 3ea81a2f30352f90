"""Headline benchmark: sketch-query retrieval throughput against an
HBM-resident gallery, ours (batched, one fused TPU program) vs the
reference's own evaluation recipe (per-query torch loop —
`inference.py:94-136`: per sketch, pairwise distance to every gallery row +
full-gallery top-k; torch CPU is the reference hardware available here).

Prints ONE JSON line:
  {"metric": "retrieval_query_qps_10k_gallery", "value": <our qps>,
   "unit": "queries/sec", "vs_baseline": <our qps / reference-loop qps>}

Extra diagnostics (encoder embeddings/sec/chip, fused-kernel regimes,
1M-gallery sweep) go to stderr.

TIMING METHODOLOGY (see CLAUDE.md): `jax.block_until_ready` through the
axon tunnel can return before device execution finishes, which produced
physically impossible numbers in round 1 (BENCH_r01's 8.2M qps implies
>2,000 TFLOP/s on a 197 TFLOP/s chip). Honest timing chains each rep on
the previous rep's output (forcing in-order device execution) and ends
with ONE host transfer as the completion barrier; the measured tunnel RTT
is subtracted once.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_GALLERY = 10_000
DIM = 1024
N_QUERIES = 512
BASELINE_QUERIES = 64  # reference loop is slow; measure a subset
BIG_N = 1_000_000
BIG_Q = 4096
ROUNDS = 4  # interleaved timing rounds; report min (time-shared chip)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_rtt() -> float:
    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.int32)
    _ = np.asarray(x)
    vals = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(x + 1)
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def honest_timeit(fn, q, reps: int, rtt: float) -> float:
    """Seconds per call of fn(q) -> (ranks, ...). Chains q on the previous
    output (in-order execution), one final transfer, RTT subtracted.

    ``reps`` is a starting point: the loop RESCALES it until device
    compute dominates the tunnel RTT (total >= 5x RTT). Without this,
    cheap configs measure RTT-estimation noise instead of compute —
    observed: the 10k XLA retrieve at reps=5 (~3 ms compute vs ~35 ms
    RTT) returned 0.03 ms/call in one round (-> an absurd 17M qps
    headline) purely because that loop's actual RTT ran below the
    ``measure_rtt`` median; min-of-rounds then amplified the glitch."""

    def run(n):
        qq, out = q, None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(qq)
            qq = qq + (out[0][0] * 0).astype(q.dtype)
        _ = np.asarray(out[0])
        return time.perf_counter() - t0

    _ = np.asarray(fn(q)[0])  # compile + drain
    while True:
        total = run(reps)
        if total >= 5.0 * rtt or reps >= 4096:
            # even at the cap, never let RTT noise eat >20% of the loop
            return max(total - rtt, 0.2 * total) / reps
        scale = (6.0 * rtt) / max(total, 1e-6)
        reps = min(max(reps * 2, int(reps * scale)), 4096)


def bench_retrieval(rtt: float) -> dict:
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.ops.distance import retrieve
    from art_sbir_tpu.ops.retrieval_pallas import (retrieve_fused,
                                                   retrieve_fused_core)

    key = jax.random.key(42)
    kg, kq = jax.random.split(key)
    g = jax.random.normal(kg, (N_GALLERY, DIM), jnp.float32)
    q = g[:N_QUERIES] + 0.1 * jax.random.normal(kq, (N_QUERIES, DIM),
                                                jnp.float32)
    p = jnp.arange(N_QUERIES, dtype=jnp.int32)
    gb = g.astype(jnp.bfloat16)
    _ = np.asarray(gb[0, 0])

    # exact-parity check of the fused production path vs the XLA reference
    r0, v0, i0 = retrieve(q, g, p, k=10)
    r1, v1, i1 = retrieve_fused(q, g, p, k=10)
    ok = bool((np.asarray(i0) == np.asarray(i1)).all()
              and (np.asarray(r0) == np.asarray(r1)).all())
    log(f"10k fused-vs-XLA exact rank/idx parity: {ok}")

    # time the jitted core: the public wrapper's exactness-certificate
    # check syncs on the host, which through the axon tunnel adds one RTT
    # per call (an artifact of this harness, ~us on a real TPU VM).
    # The chip is time-shared with preemption bursts that dwarf these
    # sub-10ms calls, so configs are INTERLEAVED across rounds and each
    # reports its min (see CLAUDE.md / PERF.md on benchmark trust).
    q1 = q[:1]
    p1 = p[:1]
    cfgs = {
        "fused_highest": (lambda qq: retrieve_fused_core(qq, g, p, k=10),
                          q, 20),
        "fused_default": (lambda qq: retrieve_fused_core(
            qq, gb, p, k=10, precision="default"), q, 20),
        # xla_highest IS the routed production path at this gallery size:
        # evaluate_retrieval sends N < FUSED_GALLERY_THRESHOLD through
        # ops.distance.retrieve at precision='highest' (rank.py:107-133)
        "xla_highest": (lambda qq: retrieve(qq, g, p, k=10), q, 5),
        "xla_default": (lambda qq: retrieve(qq, g, p, k=10,
                                            precision="default"), q, 10),
        "fused_p50_query_s": (lambda qq: retrieve_fused_core(
            qq, g, p1, k=10), q1, 20),
        # single-query latency of the ROUTED path (BASELINE.md's sub-ms
        # north star is judged against this one)
        "xla_p50_query_s": (lambda qq: retrieve(qq, g, p1, k=10), q1, 20),
    }
    out = {name: float("inf") for name in cfgs}
    for _ in range(ROUNDS):
        for name, (fn, qq, reps) in cfgs.items():
            out[name] = min(out[name], honest_timeit(fn, qq, reps, rtt))
    return out


def bench_fused_sharded_on_tpu() -> None:
    """Compile (Mosaic, NOT interpret) the sharded fused kernel on a
    1-device TPU mesh and assert it matches the single-chip kernel — the
    CPU suite can only run it in interpret mode, so this is the one place
    Mosaic-only lowering bugs in the shard_map form would surface
    (VERDICT r2 item 6)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from art_sbir_tpu.ops.retrieval_pallas import (retrieve_fused,
                                                   retrieve_fused_sharded)

    key = jax.random.key(3)
    kg, kq = jax.random.split(key)
    g = jax.random.normal(kg, (4096, 256), jnp.float32)
    q = g[:64] + 0.1 * jax.random.normal(kq, (64, 256), jnp.float32)
    p = jnp.arange(64, dtype=jnp.int32)
    mesh = Mesh(np.array(jax.devices()[:1]), ("gallery",))
    r0, v0, i0 = retrieve_fused(q, g, p, k=10)
    r1, v1, i1 = retrieve_fused_sharded(q, g, p, mesh, k=10)
    ok = bool((np.asarray(r0) == np.asarray(r1)).all()
              and (np.asarray(i0) == np.asarray(i1)).all()
              and np.allclose(np.asarray(v0), np.asarray(v1)))
    log(f"fused-sharded on TPU (1-device mesh, compiled Mosaic) parity: {ok}")
    if not ok:
        raise AssertionError("fused-sharded != fused on TPU")

    # sharded IVF compiled on TPU (shard_map + axis_index + lexsort merge
    # — the CPU suite covers semantics; this covers the TPU lowering).
    # Full probe must equal the exact path bit-for-bit on indices.
    from art_sbir_tpu.ops.distance import retrieve_chunked
    from art_sbir_tpu.ops.ivf import build_ivf_sharded, ivf_search_sharded

    sidx = build_ivf_sharded(g, 1, 64)
    sv, si = ivf_search_sharded(q, sidx, g, mesh, nprobe=sidx.nlist, k=10)
    _, _, ei = retrieve_chunked(q, g, p, k=10, chunk=64)
    ok = bool((np.asarray(si) == np.asarray(ei)).all())
    log(f"sharded-IVF on TPU (1-device mesh, full probe == exact): {ok}")
    if not ok:
        raise AssertionError("sharded IVF full probe != exact on TPU")

    # sharded IVF-PQ compiled on TPU (per-shard ADC scan + local exact
    # rerank inside shard_map): full probe + full rerank == exact indices
    from art_sbir_tpu.ops.pq import build_ivf_pq_sharded, \
        ivf_pq_search_sharded

    cb, codes = build_ivf_pq_sharded(g, sidx, 16, k_codes=256, iters=4)
    pv, pi = ivf_pq_search_sharded(q, sidx, codes, cb, mesh,
                                   nprobe=sidx.nlist, k=10, rows=g,
                                   rerank_factor=1000)
    ok = bool((np.asarray(pi) == np.asarray(ei)).all())
    log(f"sharded-IVF-PQ on TPU (full probe + full rerank == exact): {ok}")
    if not ok:
        raise AssertionError("sharded IVF-PQ full rerank != exact on TPU")


def bench_crossover(rtt: float) -> None:
    """Compact fused-vs-XLA crossover table (Q=512, both at the routing
    precision f32-highest) — the empirical basis for rank.py's
    FUSED_GALLERY_THRESHOLD. The XLA comparator is the plain `retrieve`
    evaluate_retrieval actually calls below the threshold (full (Q, N)
    matrix per 1024-query chunk), NOT retrieve_chunked. The full sweep
    (two Q sizes, both precisions, chunked comparator) lives in
    scripts/probe_crossover.py."""
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.ops.distance import retrieve
    from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused_core

    nq = 512
    for n in (50_000, 100_000, 200_000, 400_000):
        kg, kq = jax.random.split(jax.random.key(n))
        g = jax.random.normal(kg, (n, DIM), jnp.float32)
        q = g[:nq] + 0.1 * jax.random.normal(kq, (nq, DIM), jnp.float32)
        p = jnp.arange(nq, dtype=jnp.int32)
        _ = np.asarray(g[0, 0])
        reps = max(1, min(6, 2_000_000_000 // (n * nq)))
        fused, xla = float("inf"), float("inf")
        for _ in range(2):
            fused = min(fused, honest_timeit(
                lambda qq: retrieve_fused_core(qq, g, p, k=10), q, reps, rtt))
            xla = min(xla, honest_timeit(
                lambda qq: retrieve(qq, g, p, k=10), q, reps, rtt))
        log(f"crossover N={n:>7,}: fused {fused*1e3:7.2f} ms | "
            f"XLA retrieve {xla*1e3:7.2f} ms | "
            f"fused speedup {xla/fused:.2f}x")
        del g


def bench_big_gallery(rtt: float) -> None:
    """The regime the fused kernel exists for: (Q, N) matrix HBM-prohibitive
    (4096 x 1M f32 = 16 GB > HBM), so XLA must chunk queries and pay
    lax.top_k per chunk while the fused kernel streams the gallery."""
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.ops.distance import retrieve_chunked
    from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused_core

    key = jax.random.key(7)
    kg, kq = jax.random.split(key)
    g = jax.random.normal(kg, (BIG_N, DIM), jnp.float32)
    q = g[:BIG_Q] + 0.1 * jax.random.normal(kq, (BIG_Q, DIM), jnp.float32)
    p = jnp.arange(BIG_Q, dtype=jnp.int32)
    gb = g.astype(jnp.bfloat16)
    _ = np.asarray(gb[0, 0])

    fused, chunked = float("inf"), float("inf")
    for _ in range(ROUNDS):  # interleaved min-of-rounds (time-shared chip)
        fused = min(fused, honest_timeit(
            lambda qq: retrieve_fused_core(qq, gb, p, k=10,
                                           precision="default"), q, 2, rtt))
        chunked = min(chunked, honest_timeit(
            lambda qq: retrieve_chunked(qq, g, p, k=10, precision="default",
                                        chunk=256), q, 1, rtt))
    log(f"1M-gallery fused (bf16 stream): {fused*1e3:.0f} ms "
        f"for {BIG_Q} queries = {BIG_Q/fused:,.0f} qps")
    log(f"1M-gallery chunked XLA (bf16 matmul): {chunked*1e3:.0f} ms "
        f"= {BIG_Q/chunked:,.0f} qps -> fused speedup {chunked/fused:.2f}x")

    # int8 streaming mode: quarter of the f32 gallery read, int8 MXU rate.
    # Time the no-fallback fast path (quantize queries -> streamed scan ->
    # exact rerank, no host certificate sync — that sync rides the result
    # drain in production); the certificate and candidate quality are
    # verified once, separately.
    from art_sbir_tpu.ops.quant import (_rerank_jit, _symmetric_quantize,
                                        quantize_gallery,
                                        retrieve_quantized_fused,
                                        topk_overlap)
    from art_sbir_tpu.ops.retrieval_pallas import quant_candidates_fused

    qg = quantize_gallery(g, "euclidean")
    _ = np.asarray(qg.q8[0, 0])

    def q8_fast(qq):
        # serving-route config: r = rerank_factor(4) * k(10), kernel
        # defaults depth=8 / seg_reduce=8 (e2e-measured sweet spot:
        # deep files are free under the fold and cut the flagged-row
        # count 2-4x, scripts/probe_quant_depth.py)
        q8, s_q = _symmetric_quantize(qq)
        _, cand, cert = quant_candidates_fused(
            q8, s_q, qg.q8, qg.scale, qg.sq_norm, r=40, metric="euclidean")
        vals, _ = _rerank_jit(qq, jnp.sort(cand, axis=1), g,
                              metric="euclidean", k=10)
        return vals, cert

    # END-TO-END serving route (engine regime: rerank_factor=4,
    # device_get rides vals/idx/cert on one host transfer, fallback
    # merged on host) — the latency a client of the big-N serving path
    # sees, incl. tunnel RTTs (PERF.md "End-to-end serving latency")
    def q8_e2e():
        return retrieve_quantized_fused(q, qg, g, k=10, rerank_factor=4,
                                        device_get=True)

    q8_e2e()  # warm fast path + fallback shapes
    q8t, e2e = float("inf"), float("inf")
    for _ in range(max(ROUNDS, 6)):  # interleave configs (time-shared chip)
        q8t = min(q8t, honest_timeit(lambda qq: q8_fast(qq)[0], q, 2, rtt))
        t0 = time.perf_counter()
        q8_e2e()
        e2e = min(e2e, time.perf_counter() - t0)
    # certificate + quality check through the public (fallback) wrapper
    cert_frac = float(np.asarray(q8_fast(q)[1]).mean())
    _, idx_q8 = retrieve_quantized_fused(q, qg, g, k=10, rerank_factor=4)
    _, _, idx_ex, _ = retrieve_fused_core(q, gb, p, k=10,
                                          precision="default")
    ov = topk_overlap(idx_q8, idx_ex)
    log(f"1M-gallery int8 streamed scan + exact rerank: {q8t*1e3:.0f} ms "
        f"= {BIG_Q/q8t:,.0f} qps -> {fused/q8t:.2f}x over bf16 fused; "
        f"top-10 overlap vs exact {ov:.4f}, certificate pass "
        f"{cert_frac:.4f}")
    log(f"1M-gallery int8 serving route e2e (device_get, incl. RTTs): "
        f"{e2e*1e3:.0f} ms for {BIG_Q} queries = {BIG_Q/e2e:,.0f} qps")


def bench_reference_loop(gallery: np.ndarray, queries: np.ndarray) -> float:
    """The reference's per-query evaluation recipe in torch (CPU)."""
    import torch

    g = torch.from_numpy(gallery)
    pd = torch.nn.PairwiseDistance(p=2)
    t0 = time.perf_counter()
    with torch.inference_mode():
        for i in range(BASELINE_QUERIES):
            qf = torch.from_numpy(queries[i : i + 1])
            distances = pd(qf, g)
            _, indices = distances.topk(len(g), largest=False)
            _ = (indices == (i % len(g))).nonzero()
            _, _ = distances.topk(10, largest=False)
    dt = time.perf_counter() - t0
    return BASELINE_QUERIES / dt


def bench_train_step(rtt: float) -> None:
    """Diagnostic: flagship triplet train step (3x RN50 bf16 fwd+bwd +
    torch-parity Adam in one donated XLA program) at TWO batch sizes —
    the batch-scaling evidence the training roofline rests on (PERF.md
    "Training roofline"; VERDICT r3 item 1 asks BENCH to carry
    triplets/s at >=2 batch sizes)."""
    import time

    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.models.resnet import ModifiedResNet
    from art_sbir_tpu.train.losses import TripletLossConfig
    from art_sbir_tpu.train.triplet import create_train_state, make_train_step

    model = ModifiedResNet(dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.key(0), (1, 224, 224, 3))
    step = make_train_step(TripletLossConfig())
    rng = np.random.default_rng(0)
    for b in (32, 64):
        batch = {
            k: jnp.asarray(rng.standard_normal((b, 224, 224, 3)),
                           jnp.float32)
            for k in ("sketch", "positive", "negative")
        }
        state, m = step(state, batch)  # compile
        _ = float(m["loss"])
        reps, best = 5, float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            for _ in range(reps):
                state, m = step(state, batch)
            _ = float(m["loss"])  # host barrier ends the chained reps
            best = min(best, max(time.perf_counter() - t0 - rtt,
                                 1e-9) / reps)
        log(f"triplet train step (b{b}, 3x RN50 bf16 fwd+bwd + Adam, "
            f"donated): {best*1e3:.1f} ms = {b/best:,.0f} triplets/s/chip")


def bench_embed_sweep() -> None:
    """Diagnostic: the production `embed_batched` sweep end-to-end (host
    uint8 -> device-resident (N, D) -> one drain), in-memory 2,048-image
    gallery. This is the path run_inference drives; it includes the
    host->device uploads the pure-device encoder number excludes."""
    import time

    import jax.numpy as jnp

    from art_sbir_tpu.models.resnet import ModifiedResNet
    from art_sbir_tpu.ops.resize import CLIP_MEAN, CLIP_STD, normalize
    from art_sbir_tpu.retrieval.embed import embed_batched

    import jax

    model = ModifiedResNet(dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.key(0), jnp.zeros((8, 224, 224, 3), jnp.float32),
        train=False,
    )

    def forward(u8):
        f = normalize(u8.astype(jnp.bfloat16) / 255.0, CLIP_MEAN, CLIP_STD)
        return model.apply(variables, f, train=False)

    rng = np.random.default_rng(0)
    n = 2048
    imgs = rng.integers(0, 256, (n, 224, 224, 3)).astype(np.uint8)
    _ = embed_batched(forward, imgs, batch_size=256)  # warm compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _ = embed_batched(forward, imgs, batch_size=256)
        best = min(best, time.perf_counter() - t0)
    log(f"embed sweep e2e (in-memory {n} imgs, incl. uploads): "
        f"{best:.2f} s = {n/best:,.0f} emb/s")


def bench_encoder(rtt: float) -> float:
    """Diagnostic: ModifiedResNet50 gallery embedding throughput (bf16).

    The production path: uint8 host batches with the CLIP normalize fused
    into the same XLA program (see PERF.md for the roofline analysis)."""
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.models.resnet import ModifiedResNet
    from art_sbir_tpu.ops.resize import CLIP_MEAN, CLIP_STD, normalize

    model = ModifiedResNet(dtype=jnp.bfloat16)
    batch = 512  # best measured throughput point on v5e (PERF.md scaling)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3)), jnp.uint8)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.key(0), jnp.zeros((8, 224, 224, 3), jnp.float32), train=False
    )

    def forward(im_u8):
        f = normalize(im_u8.astype(jnp.bfloat16) / 255.0, CLIP_MEAN, CLIP_STD)
        return model.apply(variables, f, train=False)

    fwd = jax.jit(forward)
    out = fwd(x)
    _ = np.asarray(out[0, 0])
    runs = 5
    best = float("inf")
    for _ in range(ROUNDS):  # min-of-rounds (time-shared chip)
        t0 = time.perf_counter()
        for _ in range(runs):
            out = fwd(x)
            x = x + (out[0, 0] * 0).astype(jnp.uint8)  # chain, no-op value
        _ = np.asarray(out[0, 0])
        best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9) / runs)
    return batch / best


def bench_serving(rtt: float) -> None:
    """Diagnostic: the serving engine's fused query program (u8 query ->
    RN50 encode -> distance vs 10k-row resident gallery -> top-k) at
    micro-batch buckets 1 / 8 / 32. Single-request numbers include one
    host transfer — that IS the serving latency a client sees; batch
    numbers show what micro-batching buys (retrieval/server.py)."""
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.models.resnet import ModifiedResNet
    from art_sbir_tpu.ops.resize import CLIP_MEAN, CLIP_STD, normalize
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    model = ModifiedResNet(dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.key(0), jnp.zeros((8, 224, 224, 3), jnp.float32),
        train=False)

    def forward(im_u8):
        f = normalize(im_u8.astype(jnp.bfloat16) / 255.0, CLIP_MEAN, CLIP_STD)
        return model.apply(variables, f, train=False)

    rng = np.random.default_rng(7)
    gallery = rng.standard_normal((N_GALLERY, DIM)).astype(np.float32)
    paths = [f"img_{i}" for i in range(N_GALLERY)]
    engines = [("exact", RetrievalEngine(
        forward, gallery, paths, image_size=224, k_max=10, max_batch=32))]
    engines.append(("int8+rerank", RetrievalEngine(
        forward, gallery, paths, image_size=224, k_max=10, max_batch=32,
        quantize=True)))
    for tag, eng in engines:
        for b in (1, 8, 32):
            q = rng.integers(0, 256, (b, 224, 224, 3)).astype(np.uint8)
            eng.search_arrays(q)  # warm compile for this bucket
            best = float("inf")
            for _ in range(ROUNDS):
                t0 = time.perf_counter()
                for _ in range(3):
                    eng.search_arrays(q)  # incl. host result transfer
                best = min(best, (time.perf_counter() - t0) / 3)
            log(f"serving query program [{tag}] b={b}: "
                f"{best*1e3:.2f} ms/req "
                f"({b/best:,.0f} qps incl. encode + one host drain)")


def bench_ivf(rtt: float) -> None:
    """Diagnostic: the IVF clustered-index route at the serving regime
    (small coalesced batch, big CLUSTERED gallery — the geometry its
    recall contract is written for) vs the fused exact scan. Re-measures
    the N-independent-dispatch claim each round (PERF.md "IVF clustered
    index"); dispatch -> host pull, like the engine."""
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.ops.distance import retrieve_chunked
    from art_sbir_tpu.ops.ivf import build_ivf, ivf_search
    from art_sbir_tpu.ops.quant import topk_overlap
    from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused

    n, b = 600_000, 8
    kc, ka, kn, kq = jax.random.split(jax.random.key(17), 4)
    nb = int(np.sqrt(n))
    centers = 4.0 * jax.random.normal(kc, (nb, DIM), jnp.float32)
    assign = jax.random.randint(ka, (n,), 0, nb)
    g = (jnp.take(centers, assign, axis=0)
         + 0.5 * jax.random.normal(kn, (n, DIM), jnp.float32))
    _ = np.asarray(g[0, 0])
    t0 = time.perf_counter()
    index = build_ivf(g, None)
    _ = np.asarray(index.row_ids[0, 0])
    build_s = time.perf_counter() - t0
    q = g[:b] + 0.1 * jax.random.normal(kq, (b, DIM), jnp.float32)
    pos = jnp.zeros(b, jnp.int32)

    def ivf():
        return jax.device_get(ivf_search(q, index, g, nprobe=8, k=10))

    def fused():
        _, v, i = retrieve_fused(q, g, pos, k=10, with_ranks=False,
                                 device_get=True)
        return v, i

    ivf(), fused()  # warm/compile
    ti = tf = float("inf")
    for _ in range(max(ROUNDS, 6)):  # interleaved (time-shared chip)
        t0 = time.perf_counter()
        ivf()
        ti = min(ti, time.perf_counter() - t0)
        t0 = time.perf_counter()
        fused()
        tf = min(tf, time.perf_counter() - t0)
    _, ids = ivf_search(q, index, g, nprobe=8, k=10)
    _, _, ei = retrieve_chunked(q, g, pos, k=10, chunk=b)
    ov = topk_overlap(ids, ei)
    log(f"IVF route (600k clustered, B={b}, nprobe=8): "
        f"{ti*1e3:.1f} ms/dispatch vs fused exact {tf*1e3:.1f} ms "
        f"({tf/ti:.2f}x); build {build_s:.0f}s, recall@10 vs exact "
        f"{ov:.4f} ({index.stats()['nlist']} clusters)")

    # IVF-PQ tier (residual codes, 64 B/row; engine-default r=64*k rerank
    # on bf16 rows) — capacity ladder re-measured each round (PERF.md)
    from art_sbir_tpu.ops.pq import build_ivf_pq, ivf_pq_search

    t0 = time.perf_counter()
    cb, codes = build_ivf_pq(g, index, 64)
    _ = np.asarray(codes[0, 0])
    pq_build = time.perf_counter() - t0
    gb16 = g.astype(jnp.bfloat16)

    def pq():
        return jax.device_get(ivf_pq_search(q, index, codes, cb, nprobe=8,
                                            k=10, rows=gb16,
                                            rerank_factor=64))

    pq()
    tp = float("inf")
    for _ in range(max(ROUNDS, 6)):
        t0 = time.perf_counter()
        pq()
        tp = min(tp, time.perf_counter() - t0)
    _, pids = ivf_pq_search(q, index, codes, cb, nprobe=8, k=10,
                            rows=gb16, rerank_factor=64)
    log(f"IVF-PQ route (residual m=64, r=640 bf16-rerank, B={b}): "
        f"{tp*1e3:.1f} ms/dispatch, build {pq_build:.0f}s, "
        f"recall@10 vs exact {topk_overlap(pids, ei):.4f}")


def tpu_reachable(timeout_s: float = 240.0) -> bool:
    """Probe backend init AND one tiny dispatch in a SUBPROCESS with a
    timeout: when the axon relay is down, ``jax.devices()`` blocks
    indefinitely in-process (the plugin retries the dial forever) — and a
    second failure mode observed in round 4 has init SUCCEED while every
    device EXECUTION hangs (chip-side outage), so the probe must round-
    trip an actual computation, not just the backend handshake. The
    child exits before we proceed, so the serialized tunnel is free."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy; "
             "numpy.asarray(jax.numpy.zeros((8,), jax.numpy.int32) + 1)"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    from art_sbir_tpu.core.cache import enable_compilation_cache

    if not tpu_reachable():
        log("TPU backend unreachable (axon relay down?) — failing fast "
            "instead of hanging; no measurements this run")
        print(json.dumps({
            "metric": "retrieval_query_qps_10k_gallery",
            "value": 0.0,
            "unit": "queries/sec",
            "vs_baseline": 0.0,
            "error": "TPU backend unreachable (relay down); see stderr",
        }))
        return

    enable_compilation_cache()
    rtt = measure_rtt()
    log(f"tunnel RTT: {rtt*1e3:.1f} ms (subtracted once per timing loop)")

    r = bench_retrieval(rtt)
    log(f"10k retrieval, 512-query batches (ms/call): "
        f"fused highest {r['fused_highest']*1e3:.2f} | "
        f"fused default {r['fused_default']*1e3:.2f} | "
        f"XLA highest {r['xla_highest']*1e3:.2f} | "
        f"XLA default {r['xla_default']*1e3:.2f}")
    log(f"single-query p50: routed XLA {r['xla_p50_query_s']*1e3:.3f} ms | "
        f"fused {r['fused_p50_query_s']*1e3:.3f} ms (parity precision; "
        f"BASELINE.md sub-ms north star judged on the routed number)")
    # the headline is the ROUTED production path: evaluate_retrieval sends
    # 10k-row galleries through the XLA retrieve at precision='highest'
    # (rank.py FUSED_GALLERY_THRESHOLD routing) — not the fused kernel,
    # which wins only past the measured crossover (see crossover table)
    qps = N_QUERIES / r["xla_highest"]
    log(f"production path (routed: XLA retrieve, parity precision): "
        f"{qps:,.0f} qps")

    rng = np.random.default_rng(42)
    gallery = rng.standard_normal((N_GALLERY, DIM)).astype(np.float32)
    queries = (
        gallery[rng.integers(0, N_GALLERY, N_QUERIES)]
        + 0.1 * rng.standard_normal((N_QUERIES, DIM)).astype(np.float32)
    )
    ref_qps = bench_reference_loop(gallery, queries)
    log(f"reference loop (torch cpu): {ref_qps:.1f} qps")

    try:
        enc = bench_encoder(rtt)
        log(f"encoder: {enc:.1f} gallery embeddings/sec/chip "
            f"(bf16, batch 512, fused u8 normalize)")
    except Exception as e:  # encoder bench is diagnostic only
        log(f"encoder bench skipped: {e}")

    try:
        bench_embed_sweep()
    except Exception as e:  # diagnostic only
        log(f"embed sweep bench skipped: {e}")

    try:
        bench_train_step(rtt)
    except Exception as e:  # diagnostic only
        log(f"train-step bench skipped: {e}")

    try:
        bench_fused_sharded_on_tpu()
    except Exception as e:  # pragma: no cover - diagnostic
        log(f"fused-sharded TPU parity skipped: {e}")

    try:
        bench_serving(rtt)
    except Exception as e:  # diagnostic only
        log(f"serving bench skipped: {e}")

    try:
        bench_crossover(rtt)
    except Exception as e:
        log(f"crossover bench skipped: {e}")

    try:
        bench_big_gallery(rtt)
    except Exception as e:
        log(f"1M-gallery bench skipped: {e}")

    try:
        bench_ivf(rtt)
    except Exception as e:  # diagnostic only
        log(f"IVF bench skipped: {e}")

    # headline sourcing rule (PERF.md "headline sourcing"): the README/
    # SERVING number is the latest driver artifact BENCH_r0N.json; print
    # the artifact history next to this session so doc drift is visible
    # in the log itself (round 2 and 3 both shipped a README ~10% off
    # the canonical artifact).
    try:
        import re
        from pathlib import Path

        hist = []
        for p in sorted(Path(__file__).parent.glob("BENCH_r*.json")):
            m = re.search(r'"value": ([0-9.]+)',
                          json.loads(p.read_text()).get("tail", ""))
            if m:
                hist.append(f"{p.name}={float(m.group(1)):,.0f}")
        log(f"headline history (driver artifacts): {', '.join(hist)} | "
            f"this session: {qps:,.0f} qps — README quotes the artifact, "
            f"session numbers are spread context")
    except Exception as e:
        log(f"headline-history print skipped: {e}")

    # regime context rides in the artifact itself: the 10k headline is
    # DISPATCH-dominated, so it tracks the shared relay's per-call
    # overhead, which moves 3-5x between sessions with zero code change
    # (PERF.md "Third regime shift"); rtt_ms and the compute-bound
    # encoder anchor let a reader normalize cross-round artifacts.
    out = {
        "metric": "retrieval_query_qps_10k_gallery",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / ref_qps, 2),
        "rtt_ms": round(rtt * 1e3, 1),
    }
    try:
        out["encoder_emb_per_s"] = round(enc, 1)
    except NameError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
