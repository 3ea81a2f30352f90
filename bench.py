"""Headline benchmark: sketch-query retrieval throughput against an
HBM-resident gallery, ours (batched, one MXU program, one real TPU chip)
vs the reference's own evaluation recipe (per-query torch loop —
`inference.py:94-136`: per sketch, pairwise distance to every gallery row +
full-gallery top-k; torch CPU is the reference hardware available here).

Prints ONE JSON line:
  {"metric": "retrieval_query_qps_10k_gallery", "value": <our qps>,
   "unit": "queries/sec", "vs_baseline": <our qps / reference-loop qps>}

Extra diagnostics (encoder embeddings/sec/chip, p50 query latency) go to
stderr.
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


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_ours(gallery: np.ndarray, queries: np.ndarray, pos: np.ndarray) -> dict:
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.ops.distance import retrieve

    g = jnp.asarray(gallery)
    q = jnp.asarray(queries)
    p = jnp.asarray(pos)

    # warmup/compile
    r, v, i = retrieve(q, g, p, k=10)
    jax.block_until_ready((r, v, i))

    # rotate the query matrix every run so no dispatch-level caching can
    # short-circuit repeated identical calls
    runs = 20
    qs = [jnp.roll(q, s, axis=0) for s in range(runs)]
    jax.block_until_ready(qs)
    t0 = time.perf_counter()
    outs = [retrieve(qi, g, p, k=10) for qi in qs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / runs
    qps = len(queries) / dt

    # single-query latency (p50) — the serving shape
    q1, p1 = q[:1], p[:1]
    r, v, i = retrieve(q1, g, p1, k=10)
    jax.block_until_ready((r, v, i))
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        r, v, i = retrieve(q1, g, p1, k=10)
        jax.block_until_ready((r, v, i))
        lat.append(time.perf_counter() - t0)
    return {"qps": qps, "p50_query_ms": float(np.median(lat) * 1e3)}


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


def bench_encoder() -> float:
    """Diagnostic: ModifiedResNet50 gallery embedding throughput (bf16).

    The production path: uint8 host batches with the CLIP normalize fused
    into the same XLA program (see PERF.md for the roofline analysis —
    this point measures ~67% of the model's HBM-roofline ceiling)."""
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
    fwd(x).block_until_ready()
    runs = 10
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fwd(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / runs
    return batch / dt


def main() -> None:
    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(42)
    gallery = rng.standard_normal((N_GALLERY, DIM)).astype(np.float32)
    queries = (
        gallery[rng.integers(0, N_GALLERY, N_QUERIES)]
        + 0.1 * rng.standard_normal((N_QUERIES, DIM)).astype(np.float32)
    )
    pos = rng.integers(0, N_GALLERY, N_QUERIES).astype(np.int32)

    ours = bench_ours(gallery, queries, pos)
    log(f"ours: {ours['qps']:.0f} qps, p50 single-query {ours['p50_query_ms']:.3f} ms")

    ref_qps = bench_reference_loop(gallery, queries)
    log(f"reference loop (torch cpu): {ref_qps:.1f} qps")

    try:
        enc = bench_encoder()
        log(f"encoder: {enc:.1f} gallery embeddings/sec/chip "
            f"(bf16, batch 512, fused u8 normalize)")
    except Exception as e:  # encoder bench is diagnostic only
        log(f"encoder bench skipped: {e}")

    try:
        import jax
        import jax.numpy as jnp

        from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused

        g = jnp.asarray(gallery)
        q = jnp.asarray(queries)
        p = jnp.asarray(pos)
        outs = retrieve_fused(q, g, p, k=10, precision="default")
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs = [retrieve_fused(jnp.roll(q, s, 0), g, p, k=10,
                               precision="default") for s in range(10)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 10
        log(f"fused pallas kernel: {len(queries) / dt:.0f} qps "
            f"(single-pass, O(QK) memory)")
    except Exception as e:
        log(f"fused kernel bench skipped: {e}")

    print(
        json.dumps(
            {
                "metric": "retrieval_query_qps_10k_gallery",
                "value": round(ours["qps"], 1),
                "unit": "queries/sec",
                "vs_baseline": round(ours["qps"] / ref_qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
