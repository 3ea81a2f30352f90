"""Locate the fused-Pallas vs chunked-XLA retrieval crossover empirically
(VERDICT r2 item 3): time both paths at N in {10k, 50k, 100k, 200k, 400k}
x Q in {512, 4096}, bf16-default and f32-highest, min of interleaved
rounds (time-shared chip — see CLAUDE.md). Sets the evidence base for
``retrieval/rank.py::FUSED_GALLERY_THRESHOLD``.

Run on the real TPU: `python scripts/probe_crossover.py`.
Pass explicit sizes to probe inside a bracket (VERDICT r3 item 7 —
the 20-40k gap between the measured 10k/50k endpoints):
`python scripts/probe_crossover.py --n 20000 30000 40000`.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import honest_timeit, measure_rtt  # noqa: E402


def main() -> None:
    # Parse BEFORE touching the TPU: `--help` / bad flags must not require
    # a live chip or hang when the axon relay is down (ADVICE r4).
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+",
                    default=[10_000, 50_000, 100_000, 200_000, 400_000])
    ap.add_argument("--q", type=int, nargs="+", default=[512, 4096])
    args = ap.parse_args()

    from bench import tpu_reachable

    if not tpu_reachable():
        print("TPU backend unreachable — aborting before the sweep "
              "(would wedge the serialized tunnel)", file=sys.stderr)
        sys.exit(2)

    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.ops.distance import retrieve, retrieve_chunked
    from art_sbir_tpu.ops.retrieval_pallas import retrieve_fused_core

    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr, flush=True)

    DIM = 1024
    rows = []
    for n in args.n:
        key = jax.random.key(n)
        kg, kq = jax.random.split(key)
        g = jax.random.normal(kg, (n, DIM), jnp.float32)
        gb = g.astype(jnp.bfloat16)
        for nq in args.q:
            q = g[:nq] + 0.1 * jax.random.normal(kq, (nq, DIM), jnp.float32)
            p = jnp.arange(nq, dtype=jnp.int32)
            _ = np.asarray(gb[0, 0])
            reps = max(1, min(10, 4_000_000_000 // (n * nq)))
            cfgs = {
                "fused_bf16": lambda qq: retrieve_fused_core(
                    qq, gb, p, k=10, precision="default"),
                "chunk_bf16": lambda qq: retrieve_chunked(
                    qq, g, p, k=10, precision="default", chunk=256),
                "fused_f32": lambda qq: retrieve_fused_core(qq, g, p, k=10),
                "chunk_f32": lambda qq: retrieve_chunked(
                    qq, g, p, k=10, chunk=256),
                # what evaluate_retrieval ACTUALLY calls below the
                # threshold: one full (Q, N) matrix (queries pre-chunked
                # to 1024 by the caller) — skip where it would exceed ~8GB
                **({"xla_full_f32": lambda qq: retrieve(qq, g, p, k=10)}
                   if n * nq * 4 < 8_000_000_000 else {}),
            }
            best = {name: float("inf") for name in cfgs}
            for _ in range(3):
                for name, fn in cfgs.items():
                    best[name] = min(best[name], honest_timeit(fn, q, reps, rtt))
            row = {"n": n, "q": nq,
                   **{k2: round(v * 1e3, 2) for k2, v in best.items()}}
            row["speedup_bf16"] = round(best["chunk_bf16"] / best["fused_bf16"], 2)
            row["speedup_f32"] = round(best["chunk_f32"] / best["fused_f32"], 2)
            rows.append(row)
            print(json.dumps(row), flush=True)
        del g, gb
    print(json.dumps({"table": rows}), file=sys.stderr)


if __name__ == "__main__":
    main()
