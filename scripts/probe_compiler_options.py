"""Probe per-jit XLA compiler_options on the axon plugin for the encoder.

PERF.md previously recorded that TPU tuning flags were unreachable because
the plugin rejects them in XLA_FLAGS — but `jax.jit(compiler_options=...)`
ships flags through the compile RPC and (measured here) IS accepted.
This probe times the production encoder forward (ModifiedResNet50 bf16,
batch 512, fused uint8 normalize — same program as bench.py's
bench_encoder) under candidate flag sets, interleaved min-of-rounds.

Run: timeout 560 python scripts/probe_compiler_options.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


CANDIDATES = {
    "baseline": None,
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "lhs+vmem64m": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_scoped_vmem_limit_kib": "65536",
    },
    "no_rwb_fusion": {"xla_tpu_rwb_fusion": "false"},
    "async_ag": {"xla_tpu_enable_async_collective_fusion": "true"},
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.core.cache import enable_compilation_cache
    from art_sbir_tpu.models.resnet import ModifiedResNet
    from art_sbir_tpu.ops.resize import CLIP_MEAN, CLIP_STD, normalize

    enable_compilation_cache()
    model = ModifiedResNet(dtype=jnp.bfloat16)
    batch = 512
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3)), jnp.uint8)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.key(0), jnp.zeros((8, 224, 224, 3), jnp.float32),
        train=False,
    )

    def forward(im_u8):
        f = normalize(im_u8.astype(jnp.bfloat16) / 255.0, CLIP_MEAN, CLIP_STD)
        return model.apply(variables, f, train=False)

    # measure tunnel RTT once
    z = jnp.zeros((8,), jnp.int32)
    _ = np.asarray(z)
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(z + 1)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    log(f"rtt {rtt*1e3:.1f} ms")

    compiled = {}
    for name, opts in CANDIDATES.items():
        try:
            fn = (jax.jit(forward) if opts is None
                  else jax.jit(forward, compiler_options=opts))
            out = fn(x0)  # compile + smoke
            _ = np.asarray(out[0, 0])
            compiled[name] = fn
            log(f"compiled {name}")
        except Exception as e:  # noqa: BLE001 — flag may not exist remotely
            log(f"{name} FAILED to compile: {type(e).__name__} "
                f"{str(e)[:160]}")

    runs = 5
    best = {name: float("inf") for name in compiled}
    for rnd in range(4):
        for name, fn in compiled.items():
            x = x0
            t0 = time.perf_counter()
            out = fn(x)
            for _ in range(runs - 1):
                x = x + (out[0, 0] * 0).astype(jnp.uint8)  # chain reps
                out = fn(x)
            _ = np.asarray(out[0, 0])
            dt = max(time.perf_counter() - t0 - rtt, 1e-9) / runs
            best[name] = min(best[name], dt)
        log(f"round {rnd}: " + " | ".join(
            f"{n} {best[n]*1e3:.1f}ms" for n in compiled))

    base = best.get("baseline", float("inf"))
    log("---- final (min-of-rounds, batch 512) ----")
    for name, dt in sorted(best.items(), key=lambda kv: kv[1]):
        log(f"{name:>14}: {dt*1e3:6.1f} ms = {batch/dt:7.0f} emb/s "
            f"({base/dt:.3f}x vs baseline)")


if __name__ == "__main__":
    main()
