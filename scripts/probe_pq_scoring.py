"""ADC scoring forms head-to-head on the chip (IVF-PQ hot loop).

The residual IVF-PQ scan scores gathered candidate codes against
per-(query, probe) LUTs. Three lowerings of
``score[b, c] = sum_m LUT[b, m, codes[b, c, m]]``:

* ``onehot_f32`` — the shipped form: `lax.scan` over M, each step an
  f32 one-hot (B, C, K) x (B, K) batched matmul. Exact, but the one-hot
  operand materializes B*C*K*4 bytes per step (~28 MB at the engine
  regime) -> ~64 steps of pure traffic.
* ``onehot_bf16`` — same with bf16 one-hot/LUT operands, f32
  accumulation (candidate SELECTION tolerates the ~3e-3 LUT rounding
  when the rerank is exact; pure-mode values coarsen).
* ``gather_flat`` — one `take_along_axis` into the (B, M*K) flattened
  LUT with fused `m*K + code` indices, then a sum over M. Gathers are
  TPU-unfriendly in general; this measures whether B*C*M of them beat
  the one-hot traffic at these shapes.

Equivalence is asserted (bf16 to tolerance) before timing; timing is
dispatch -> host pull at the serving regime, min of interleaved rounds.

Usage: python scripts/probe_pq_scoring.py [--rounds 8] [--cpu]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--rounds", type=int, default=8)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from art_sbir_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

if not args.cpu and not bench.tpu_reachable():
    print("TPU unreachable; aborting")
    sys.exit(1)

rtt = bench.measure_rtt()
bench.log(f"RTT {rtt * 1e3:.1f} ms")

M, K, C = 64, 256, 848  # engine regime: m=64 codes, 256 centroids, Cpad


@jax.jit
def onehot_f32(codes_c, lut):
    def body(acc, inp):
        code_m, lut_m = inp
        onehot = (code_m[..., None] == jnp.arange(K, dtype=jnp.int32)
                  ).astype(jnp.float32)
        return acc + jnp.einsum("bck,bk->bc", onehot, lut_m,
                                preferred_element_type=jnp.float32), None

    init = jnp.zeros(codes_c.shape[:2], jnp.float32)
    acc, _ = jax.lax.scan(
        body, init, (jnp.transpose(codes_c, (2, 0, 1)).astype(jnp.int32),
                     jnp.transpose(lut, (1, 0, 2))))
    return acc


@jax.jit
def onehot_bf16(codes_c, lut):
    def body(acc, inp):
        code_m, lut_m = inp
        onehot = (code_m[..., None] == jnp.arange(K, dtype=jnp.int32)
                  ).astype(jnp.bfloat16)
        return acc + jnp.einsum("bck,bk->bc", onehot,
                                lut_m.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32), None

    init = jnp.zeros(codes_c.shape[:2], jnp.float32)
    acc, _ = jax.lax.scan(
        body, init, (jnp.transpose(codes_c, (2, 0, 1)).astype(jnp.int32),
                     jnp.transpose(lut, (1, 0, 2))))
    return acc


@jax.jit
def gather_flat(codes_c, lut):
    b, c, m = codes_c.shape
    flat = lut.reshape(b, m * K)
    idx = (jnp.arange(m, dtype=jnp.int32) * K)[None, None, :] \
        + codes_c.astype(jnp.int32)
    vals = jnp.take_along_axis(flat, idx.reshape(b, c * m), axis=1)
    return vals.reshape(b, c, m).sum(axis=-1)


key = jax.random.key(3)
kc, kl = jax.random.split(key)
for b in (32, 256):  # Q*P at coalesced batch 4 and at max bucket 32
    codes_c = jax.random.randint(kc, (b, C, M), 0, K).astype(jnp.uint8)
    lut = jax.random.uniform(kl, (b, M, K), jnp.float32)
    ref = np.asarray(onehot_f32(codes_c, lut))
    np.testing.assert_allclose(np.asarray(gather_flat(codes_c, lut)), ref,
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(onehot_bf16(codes_c, lut)), ref,
                               rtol=2e-2, atol=2e-1)
    forms = [("onehot_f32", onehot_f32), ("onehot_bf16", onehot_bf16),
             ("gather_flat", gather_flat)]
    best = {t: float("inf") for t, _ in forms}
    for _ in range(args.rounds):
        for t, f in forms:
            t0 = time.perf_counter()
            jax.device_get(f(codes_c, lut))
            best[t] = min(best[t], time.perf_counter() - t0)
    base = best["onehot_f32"]
    for t, _ in forms:
        bench.log(f"B={b:>3} {t:<12} {best[t]*1e3:7.2f} ms "
                  f"({base/best[t]:4.2f}x vs shipped)")
print("done")
