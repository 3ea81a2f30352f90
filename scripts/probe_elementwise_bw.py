"""Probe: practical elementwise bandwidth on the layer1-fusion shape.

PERF.md attributes the encoder's roofline gap to three layer1 residual
fusions achieving ~280 GB/s. This probe asks whether that is an XLA
artifact (transposes, fusion shape) or the chip's practical elementwise
ceiling, by timing a PLAIN jitted relu(x+y) on the same tensors.

Measured (v5e via axon, chained reps + one host barrier, min-of-rounds):

    relu(x+y) bf16 [512,56,56,256]: ~7.5 ms = ~330 GB/s
    relu(x+y) f32  [512,56,56,256]: ~11.2 ms = ~440 GB/s
    relu(x+y) bf16 flat (411M):     ~7.4 ms = ~330 GB/s  (layout-independent)

Readings: (1) bf16 elementwise streams are ELEMENT-RATE bound (~55 G
elem/s), not HBM-bound — f32 moves 2x the bytes in only 1.5x the time;
(2) the layer1 fusions' ~280 GB/s is within ~15% of this plain-op
ceiling, so a handwritten Pallas elementwise kernel cannot materially
beat XLA here and the encoder's 72%-of-roofline is effectively
speed-of-light for this architecture on this chip.

Run: timeout 590 python scripts/probe_elementwise_bw.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    def bw(dtype, shape, desc):
        x = jnp.ones(shape, dtype)
        y = jnp.ones(shape, dtype)
        f = jax.jit(lambda a, b: jax.nn.relu(a + b))
        o = f(x, y)
        _ = np.asarray(o.ravel()[0])
        reps, best = 8, float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = f(x, y)
            for _ in range(reps - 1):
                o = f(o, y)  # chain for in-order device execution
            _ = np.asarray(o.ravel()[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        bytes_per = np.prod(shape) * np.dtype(dtype).itemsize * 3
        print(f"{desc}: {best*1e3:.2f} ms = {bytes_per/best/1e9:.0f} GB/s",
              file=sys.stderr, flush=True)

    bw(jnp.bfloat16, (512, 56, 56, 256), "relu(x+y) bf16 [512,56,56,256]")
    bw(jnp.float32, (512, 56, 56, 256), "relu(x+y) f32  [512,56,56,256]")
    bw(jnp.bfloat16, (512 * 56 * 56 * 256,), "relu(x+y) bf16 flat 411M")


if __name__ == "__main__":
    main()
