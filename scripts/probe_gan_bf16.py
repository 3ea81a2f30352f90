"""pix2pix train-step throughput: f32 vs bf16 mixed precision, interleaved
min-of-rounds honest timing. Successive train_step calls are data-chained
through the updated G/D states (in-order device execution), and the final
loss read is the host-transfer completion barrier; at >50 ms/step the
tunnel RTT amortizes over the R-step window. Measured (PERF.md): f32
103.0 ms/step, bf16 81.5 ms/step = 1.26x at batch 16, 256^2."""
import time

from art_sbir_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np
import jax, jax.numpy as jnp
from art_sbir_tpu.train.gan import Pix2Pix, Pix2PixConfig

B, S = 16, 256
rng = np.random.default_rng(0)
batch = {"A": jnp.asarray(rng.random((B, S, S, 3), np.float32)),
         "B": jnp.asarray(rng.random((B, S, S, 1), np.float32))}

models = {}
for name, bf in (("f32", False), ("bf16", True)):
    m = Pix2Pix(Pix2PixConfig(image_size=S, ngf=64, ndf=64, bf16=bf),
                jax.random.key(0))
    l = m.train_step(batch, jax.random.key(1))  # compile
    _ = float(l["G_total"])
    models[name] = m
    print(f"{name} compiled, G_total={float(l['G_total']):.4f}", flush=True)

best = {k: float("inf") for k in models}
R = 10
for rnd in range(4):
    for name, m in models.items():
        t0 = time.perf_counter()
        for i in range(R):
            losses = m.train_step(batch, jax.random.key(i))
        _ = float(losses["G_total"])  # host transfer barrier
        dt = (time.perf_counter() - t0) / R
        best[name] = min(best[name], dt)
        print(f"round {rnd} {name}: {dt*1e3:.1f} ms/step", flush=True)
for name, dt in best.items():
    print(f"BEST {name}: {dt*1e3:.1f} ms/step = {B/dt:.0f} img/s", flush=True)
print(f"bf16 speedup: {best['f32']/best['bf16']:.2f}x", flush=True)
