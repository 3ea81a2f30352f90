"""Trace-backed roofline for the TRAINING hot loops (VERDICT r3 item 1).

The eval encoder has a full cost model in PERF.md (FLOPs, HBM traffic,
%-of-bound, per-op attribution); the triplet step — the reference's core
loop (reference `train.py:59-74`) — only had a bare wall number. This
probe gives the jitted training steps the same treatment:

* XLA cost analysis of the compiled step (FLOPs + HBM bytes accessed)
  via ``compiled.cost_analysis()``;
* honest timing (state chained through reps, ONE host barrier, RTT
  amortized — CLAUDE.md) at several batch sizes -> the batch-scaling
  curve donation bought the headroom for;
* roofline placement: achieved TFLOP/s and GB/s vs the v5e peaks
  (~197 bf16 TFLOP/s, ~819 GB/s), % of the max(compute, memory) bound;
* optionally (--trace) a profiler capture at the flagship batch,
  aggregated per-op by scripts/xplane_tools.py.

Also measures one Pix2Pix GAN step (--gan) and one VAE step (--vae) the
same way. Run on the real chip; results land in PERF.md "Training
roofline".
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

PEAK_TFLOPS = 197e12  # v5e bf16
PEAK_HBM = 819e9

ROUNDS = 4


def log(msg: str) -> None:
    print(msg, flush=True)


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


def cost_of(compiled) -> tuple[float, float]:
    """(flops, bytes accessed) from XLA cost analysis; 0 if unavailable."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception as e:  # tunnel backends may not expose it
        log(f"  cost_analysis unavailable: {e}")
        return 0.0, 0.0


def time_step(step, state, batch, loss_key, rtt: float, reps: int = 5,
              rounds: int = ROUNDS) -> tuple[float, object]:
    """Seconds/step: each rep consumes the previous state (in-order device
    execution by construction); ONE float() host sync ends the chain.
    Loops are rescaled until device compute dominates the RTT (the
    honest_timeit rule — bench.py / PERF.md 'Second timing trap')."""
    state, m = step(state, batch)  # compile + warm
    _ = float(m[loss_key])
    best = float("inf")
    for _ in range(rounds):
        n = reps
        while True:
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, batch)
            _ = float(m[loss_key])
            total = time.perf_counter() - t0
            if total >= 5.0 * rtt or n >= 512:
                best = min(best, max(total - rtt, 0.2 * total) / n)
                break
            n = min(max(n * 2, int(n * 6.0 * rtt / max(total, 1e-6))), 512)
    return best, state


def report(name: str, secs: float, flops: float, bts: float,
           n_items: int, unit: str) -> dict:
    tf = flops / secs / 1e12 if flops else 0.0
    gbs = bts / secs / 1e9 if bts else 0.0
    bound = max(flops / PEAK_TFLOPS, bts / PEAK_HBM)
    pct = 100.0 * bound / secs if bound else 0.0
    log(f"{name}: {secs*1e3:7.1f} ms = {n_items/secs:8,.0f} {unit}/s | "
        f"{flops/1e9:8,.0f} GFLOP {bts/1e9:6.2f} GB | "
        f"{tf*1e12/1e12:6.1f} TFLOP/s ({100*tf*1e12/PEAK_TFLOPS:4.1f}% peak) "
        f"{gbs:5.0f} GB/s ({100*gbs*1e9/PEAK_HBM:4.1f}% peak) | "
        f"bound {bound*1e3:6.1f} ms -> {pct:5.1f}% of roofline")
    return {"ms": secs * 1e3, "per_s": n_items / secs, "gflop": flops / 1e9,
            "gb": bts / 1e9, "pct_of_bound": pct}


def probe_triplet(rtt: float, batches, image_size: int, trace_dir=None):
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.models.resnet import ModifiedResNet
    from art_sbir_tpu.train.losses import TripletLossConfig
    from art_sbir_tpu.train.triplet import (create_train_state,
                                            make_train_step)

    model = ModifiedResNet(dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.key(0),
                               (1, image_size, image_size, 3))
    step = make_train_step(TripletLossConfig())
    rng = np.random.default_rng(0)
    out = {}
    for b in batches:
        batch = {
            k: jnp.asarray(rng.standard_normal(
                (b, image_size, image_size, 3)), jnp.float32)
            for k in ("sketch", "positive", "negative")
        }
        # make_train_step returns the jitted step; lower() compiles
        # without executing (donation only matters at execution)
        flops, bts = cost_of(step.lower(state, batch).compile())
        try:
            secs, state = time_step(step, state, batch, "loss", rtt)
        except Exception as e:
            log(f"triplet b{b}: failed ({type(e).__name__}: {e})")
            continue
        out[b] = report(f"triplet step b{b:<3d}", secs, flops, bts,
                        b, "triplets")
        if trace_dir and b == 32:
            import jax.profiler

            with jax.profiler.trace(str(trace_dir)):
                for _ in range(3):
                    state, m = step(state, batch)
                _ = float(m["loss"])
            log(f"trace captured -> {trace_dir}")
    return out


def _time_trainer(call, loss_key: str, rtt: float, reps: int = 3,
                  rounds: int = ROUNDS) -> float:
    """Like time_step but for the stateful trainers (Pix2Pix/VAETrainer
    rebind their own state, so successive calls are data-chained by
    construction); ONE float() barrier per loop."""
    _ = float(call(0)[loss_key])  # compile + warm
    best = float("inf")
    for _ in range(rounds):
        n = reps
        while True:
            t0 = time.perf_counter()
            for i in range(n):
                m = call(i)
            _ = float(m[loss_key])
            total = time.perf_counter() - t0
            if total >= 5.0 * rtt or n >= 512:
                best = min(best, max(total - rtt, 0.2 * total) / n)
                break
            n = min(max(n * 2, int(n * 6.0 * rtt / max(total, 1e-6))), 512)
    return best


def probe_gan(rtt: float, batch_size: int = 16, image_size: int = 256):
    """The bf16 production config probe_gan_bf16.py landed (b16, 256^2)."""
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.train.gan import Pix2Pix, Pix2PixConfig

    trainer = Pix2Pix(Pix2PixConfig(image_size=image_size, bf16=True),
                      jax.random.key(0))
    rng = np.random.default_rng(0)
    batch = {
        "A": jnp.asarray(rng.random(
            (batch_size, image_size, image_size, 3), np.float32)),
        "B": jnp.asarray(rng.random(
            (batch_size, image_size, image_size, 1), np.float32)),
    }
    flops, bts = cost_of(trainer._train_step.lower(
        trainer.g, trainer.d, batch, jax.random.key(1),
        decoder_only=False).compile())
    secs = _time_trainer(
        lambda i: trainer.train_step(batch, jax.random.key(i)),
        "G_total", rtt)
    report(f"pix2pix GAN step b{batch_size} {image_size}px bf16", secs,
           flops, bts, batch_size, "img")


def probe_vae(rtt: float, batch_size: int = 64):
    """probe_vae_step.py's production config (b64, 256^2 photos)."""
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.train.vae import VAEConfig, VAETrainer

    trainer = VAETrainer(VAEConfig(bf16_encoder=True), jax.random.key(0))
    cfg = trainer.cfg
    rng = np.random.default_rng(0)
    batch = {
        "photo": jnp.asarray(rng.random(
            (batch_size, cfg.image_size, cfg.image_size, 3), np.float32)),
        "sketch_vector": jnp.asarray(rng.random(
            (batch_size, cfg.max_seq_len, 5), np.float32)),
    }
    flops, bts = cost_of(trainer._train.lower(
        trainer.state, batch, jax.random.key(1)).compile())
    secs = _time_trainer(
        lambda i: trainer.train_step(batch, jax.random.key(i)),
        "total_loss", rtt)
    report(f"photo2sketch VAE step b{batch_size} bf16-enc", secs, flops,
           bts, batch_size, "sketch")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+",
                   default=[16, 32, 64, 128])
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--trace", default=None,
                   help="directory for a profiler capture at b32")
    p.add_argument("--gan", action="store_true")
    p.add_argument("--vae", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    rtt = measure_rtt()
    log(f"rtt {rtt*1e3:.1f} ms")
    probe_triplet(rtt, args.batches, args.image_size, trace_dir=args.trace)
    if args.gan:
        probe_gan(rtt)
    if args.vae:
        probe_vae(rtt)


if __name__ == "__main__":
    main()
