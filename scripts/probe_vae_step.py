"""Photo2Sketch VAE train-step throughput probe: f32 vs bf16 encoder,
before/after the attention conv_f hoist (the reference recomputes the
feature-embedding conv every decoder timestep, models.py:159-166; the
scan-hoisted form pays it once). Chained steps via state dependence, host
transfer barrier, min-of-rounds."""
import time

from art_sbir_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np
import jax, jax.numpy as jnp
from art_sbir_tpu.train.vae import VAEConfig, VAETrainer

B, S = 64, 256
rng = np.random.default_rng(0)
batch = {"photo": jnp.asarray(rng.random((B, S, S, 3), np.float32)),
         "sketch_vector": jnp.asarray(rng.random((B, 100, 5), np.float32))}

trainers = {}
for name, bf in (("f32", False), ("bf16_enc", True)):
    t = VAETrainer(VAEConfig(bf16_encoder=bf), jax.random.key(0))
    l = t.train_step(batch, jax.random.key(1))
    _ = float(l["total_loss"])
    trainers[name] = t
    print(f"{name} compiled, total={float(l['total_loss']):.4f}", flush=True)

best = {k: float("inf") for k in trainers}
R = 10
for rnd in range(4):
    for name, t in trainers.items():
        t0 = time.perf_counter()
        for i in range(R):
            losses = t.train_step(batch, jax.random.key(i))
        _ = float(losses["total_loss"])
        dt = (time.perf_counter() - t0) / R
        best[name] = min(best[name], dt)
        print(f"round {rnd} {name}: {dt*1e3:.1f} ms/step", flush=True)
for name, dt in best.items():
    print(f"BEST {name}: {dt*1e3:.1f} ms/step = {B/dt:.0f} img/s", flush=True)
