"""Close the GAN/VAE training rooflines (VERDICT r4 item 5).

Round 4 gave the triplet step a bound-vs-achieved closure ("no >1.1x
parity-preserving lever", PERF.md "Training roofline") but left the GAN
step at "61% of bf16 peak inside convs" and the VAE step at "49%
whole-step" without adjudicating the residual. This probe closes both
the way the triplet step was closed — by measuring whether the achieved
numbers sit at a SEMANTICS/SHAPE bound or leave a lever:

A. GAN conv-shape sweep: every conv in the production pix2pix step
   (resnet_9blocks G + 70x70 PatchGAN D, b16, 256^2, bf16 — the config
   `probe_train_roofline.py --gan` traced) timed STANDALONE fwd and
   fwd+bwd under its own jit. If the per-shape achievable efficiencies,
   FLOP-weighted by the step's pass structure, reproduce the in-step
   61%, the gap is the architecture's conv-shape mix (channel-thin
   spatially-large U-Net layers under 128x128 MXU tiling) — not a
   fusion/scheduling lever XLA is missing.

B. BN stat-pass floor (analytic): the norm layers' activation bytes x
   the passes BatchNorm train-mode semantics force (fwd: one re-read of
   the conv output for batch stats; bwd: ~3 tensor-reads for dgamma/
   dbeta + dx correction terms), at the measured ~330 GB/s VPU
   element-rate ceiling (scripts/probe_elementwise_bw.py) and at HBM
   peak. Compared against the 20.1 ms `convert_reduce_fusion` bucket
   the round-4 trace measured. (The production pix2pix config is
   norm='batch' — reference `pix2pix_main.py:160` — so the stat passes
   carry cross-batch semantics exactly like the triplet step's.)

C. VAE decoder GEMM occupancy: the scan-stepped LSTM GEMMs at the
   production batch (M=64 rows) vs M=128..512. At M=64 the gate GEMM
   reads its (517+512)x2048 bf16 weights every one of the ~101
   sequential scan steps at arithmetic intensity ~2M FLOP/byte-of-
   weights — the MXU row-occupancy + weight-streaming cap this sweep
   quantifies. The sequential dependence is reference semantics
   (teacher-forced LSTM, reference `models.py:79-100`).

D. (--vae_batches) VAE step at b64 vs b128: whether batch is the
   remaining throughput lever (per-step latency stays scan-bound).

Run on the real chip: `python scripts/probe_roofline_close.py`.
Results land in PERF.md "Closing the GAN/VAE rooflines".
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

PEAK_TFLOPS = 197e12  # v5e bf16
PEAK_HBM = 819e9
VPU_STREAM = 330e9  # measured bf16 element-rate ceiling (probe_elementwise_bw)

# round-4 trace facts this probe adjudicates (PERF.md "Training roofline")
GAN_STEP_MS = 77.4
GAN_CONV_MS = 46.5       # 60% bucket, 120 TFLOP/s = 61% peak in-fusion
GAN_NORM_MS = 20.1       # 26% convert_reduce_fusion bucket
VAE_STEP_PCT = 49.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def loop_time(apply, params, x, rtt: float, reps: int = 16,
              rounds: int = 4) -> float:
    """Seconds per apply(params, x) with the rep chain INSIDE one jitted
    ``lax.fori_loop`` — ONE dispatch + ONE 4-byte host pull per timing,
    so per-dispatch tunnel overhead (measured 3-7 ms/dispatch in the
    round-5 regime — PERF.md "Third regime shift") cannot dominate
    sub-ms units of work the way a host-side chained loop lets it.
    Sequential in-order execution is forced by threading each
    iteration's output scalar into the next iteration's PARAMS as
    ``w + s*1e-38`` (exactly rounds to ``w`` in f32, so values are
    stable, but the data dependency is real and XLA cannot batch or
    reorder iterations; a literal ``*0`` could be algebraically
    folded)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(p, xx, n):
        def body(i, carry):
            acc, p = carry
            out = apply(p, xx)
            # consume EVERY output element: reducing only out[0,0]
            # lets XLA's slice-of-dot / DCE rewrites delete the rest of
            # the computation (measured: the "GEMM" collapsed to a
            # K-length dot at ~3.5 us/iter). A full sum fuses into the
            # producer's epilogue, so it is near-free, and nothing can
            # be dead-coded.
            s = sum(jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree_util.tree_leaves(out))
            p = jax.tree_util.tree_map(
                lambda w: w + (s * 1e-38).astype(w.dtype), p)
            return acc + s, p
        acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0.0), p))
        return acc

    _ = float(run(params, x, 2))  # compile + drain

    def timed(n):
        t0 = time.perf_counter()
        _ = float(run(params, x, n))
        return time.perf_counter() - t0

    # two-point slope: (t(4n) - t(n)) / 3n cancels the FIXED per-call
    # cost (dispatch + RTT + loop warmup, measured ~43 ms/call in the
    # round-5 tunnel regime — larger than many units of work x n), which
    # a single-point total/n cannot separate from the marginal cost.
    # Each ENDPOINT is min'd over rounds separately before the slope is
    # taken: preemption bursts only ever inflate a timing, and a slope
    # of one inflated t(n) against one clean t(4n) collapses toward
    # zero — min-of-slopes locked such a collapse in (a 2.5 us "GEMM"
    # = 440% of peak), min-of-endpoints cannot.
    n = reps
    while True:  # size the loop so the slope dominates the RTT noise
        dt = timed(4 * n) - timed(n)
        if dt >= 5.0 * rtt or n >= 1024:
            break
        n = min(max(n * 2, int(n * 6.0 * rtt / max(dt, 1e-6))), 1024)
    t1 = min(timed(n) for _ in range(rounds))
    t4 = min(timed(4 * n) for _ in range(rounds))
    if t4 <= t1:
        raise RuntimeError("loop_time: non-positive slope (heavy "
                           "preemption?) — rerun")
    return (t4 - t1) / (3 * n)


# --------------------------------------------------------------- part A
# (name, in_hw, cin, cout, k, stride, transpose) for the b16 256^2 step.
# Spatial sizes are the conv's true input extents (reflect padding is
# applied outside VALID convs in the model; the pad copy is counted in
# the step's misc bucket, not here).
G_CONVS = [
    ("G stem 7x7", 262, 3, 64, 7, 1, False),
    ("G down1 3x3 s2", 257, 64, 128, 3, 2, False),
    ("G down2 3x3 s2", 129, 128, 256, 3, 2, False),
    ("G block conv (x18)", 66, 256, 256, 3, 1, False),
    ("G up1 ct3x3 s2", 64, 256, 128, 3, 2, True),
    ("G up2 ct3x3 s2", 128, 128, 64, 3, 2, True),
    ("G head 7x7", 262, 64, 1, 7, 1, False),
]
G_MULT = {"G block conv (x18)": 18}
D_CONVS = [
    ("D l1 4x4 s2", 258, 4, 64, 4, 2, False),
    ("D l2 4x4 s2", 130, 64, 128, 4, 2, False),
    ("D l3 4x4 s2", 66, 128, 256, 4, 2, False),
    ("D l4 4x4 s1", 34, 256, 512, 4, 1, False),
    ("D head 4x4 s1", 33, 512, 1, 4, 1, False),
]
# pass structure per G+D step, from train/gan.py's jitted step: ONE
# shared fake_b forward + G fwd+bwd inside g_loss_fn; D fwd+bwd on
# (real, fake-detached) inside d_loss_fn, plus one D forward + a
# dx-only backward chain under g_loss_fn (approximated as one extra
# forward — dx through a conv is ~one fwd-equivalent FLOP volume)
G_FWD, G_BWD = 1, 1
D_FWD, D_BWD = 2, 2


def conv_flops(b, hw, cin, cout, k, stride, transpose) -> float:
    if transpose:
        out_hw = hw * stride
        return 2.0 * b * out_hw * out_hw * cin * k * k * cout / (
            stride * stride)
    out_hw = (hw - k) // stride + 1
    return 2.0 * b * out_hw * out_hw * cout * k * k * cin


def probe_gan_convs(rtt: float, b: int = 16) -> dict:
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from art_sbir_tpu.models.layers import ConvTranspose

    rows = []
    for name, hw, cin, cout, k, stride, transpose in G_CONVS + D_CONVS:
        if transpose:
            mod = ConvTranspose(cout, k, stride=stride, padding=1,
                                dtype=jnp.bfloat16)
        else:
            mod = nn.Conv(cout, (k, k), strides=(stride, stride),
                          padding="VALID", dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (b, hw, hw, cin)), jnp.float32)
        params = jax.jit(mod.init)(jax.random.key(0), x)

        def fwd(p, xx, m=mod):
            return m.apply(p, xx)

        def fb(p, xx, m=mod):
            # grads wrt params AND input = the full dw+dx backward the
            # train step pays (3 fwd-equivalent FLOP volumes total).
            # SQUARED loss, deliberately: with a linear sum() the
            # cotangent is all-ones and dw is loop-invariant in p, so
            # XLA hoists the whole weight-grad conv out of loop_time's
            # rep loop (measured: 2e-9 s/"call"). square() makes the
            # cotangent 2*out, which depends on p — nothing hoists,
            # and it matches real training where cotangents vary.
            return jax.grad(
                lambda pp, q: jnp.sum(jnp.square(
                    m.apply(pp, q).astype(jnp.float32))),
                argnums=(0, 1))(p, xx)

        fl = conv_flops(b, hw, cin, cout, k, stride, transpose)
        t_f = loop_time(fwd, params, x, rtt)
        t_fb = loop_time(fb, params, x, rtt)
        rows.append({
            "name": name, "gflop_fwd": fl / 1e9,
            "ms_fwd": t_f * 1e3, "ms_fwdbwd": t_fb * 1e3,
            "tflops_fwd": fl / t_f / 1e12,
            # fwd+bwd(dx,dw) = 3 fwd-equivalent FLOP volumes
            "tflops_fwdbwd": 3.0 * fl / t_fb / 1e12,
            "pct_fwd": 100.0 * fl / t_f / PEAK_TFLOPS,
            "pct_fwdbwd": 100.0 * 3.0 * fl / t_fb / PEAK_TFLOPS,
        })
        log(f"{name:<22} fwd {t_f*1e3:7.2f} ms {rows[-1]['pct_fwd']:5.1f}% "
            f"| fwd+bwd {t_fb*1e3:7.2f} ms {rows[-1]['pct_fwdbwd']:5.1f}%")

    # step-level aggregate: weight each shape by its pass structure
    tot_ms = tot_fl = 0.0
    for r in rows:
        mult = G_MULT.get(r["name"], 1)
        is_g = r["name"].startswith("G")
        n_fwd, n_bwd = (G_FWD, G_BWD) if is_g else (D_FWD, D_BWD)
        # one bwd timing includes its fwd; count extra standalone fwds
        ms = mult * (n_bwd * r["ms_fwdbwd"] + n_fwd * r["ms_fwd"])
        fl = mult * (n_bwd * 3.0 + n_fwd) * r["gflop_fwd"]
        tot_ms += ms
        tot_fl += fl
    tflops = (tot_fl * 1e9) / (tot_ms * 1e-3) / 1e12
    agg = {"standalone_ms": tot_ms, "gflop": tot_fl, "tflops": tflops,
           "pct_peak": 100.0 * tflops * 1e12 / PEAK_TFLOPS}
    log(f"GAN conv mix standalone: {tot_ms:.1f} ms, {tot_fl:,.0f} GFLOP "
        f"-> {agg['pct_peak']:.1f}% of bf16 peak (in-step trace: "
        f"{GAN_CONV_MS} ms at 61%)")
    return {"rows": rows, "aggregate": agg}


# --------------------------------------------------------------- part B
G_NORM_SITES = [  # (out_hw, channels) after each normed conv, b16 bf16
    (256, 64), (128, 128), (64, 256),
    *([(64, 256)] * 18),  # 9 residual blocks x 2 norms
    (128, 128), (256, 64),
]
D_NORM_SITES = [(64, 128), (32, 256), (31, 512)]
FWD_PASSES = 1.0   # one re-read of the conv output for batch mean/var
BWD_PASSES = 3.0   # dgamma/dbeta (g, xhat) + dx correction re-reads


def bn_floor(b: int = 16) -> dict:
    g_bytes = sum(b * hw * hw * c * 2 for hw, c in G_NORM_SITES)
    d_bytes = sum(b * hw * hw * c * 2 for hw, c in D_NORM_SITES)
    # every backward pass CONTAINS a forward (G_FWD/D_FWD count only the
    # extra standalone forwards), and each forward pays the stat read —
    # so forward stat passes = n_fwd + n_bwd per network (review r5:
    # charging FWD_PASSES against the standalone forwards alone dropped
    # the fwd-inside-bwd stat reads and understated the floor ~20%)
    total = (g_bytes * ((G_FWD + G_BWD) * FWD_PASSES + G_BWD * BWD_PASSES)
             + d_bytes * ((D_FWD + D_BWD) * FWD_PASSES
                          + D_BWD * BWD_PASSES))
    floor_vpu = total / VPU_STREAM * 1e3
    floor_hbm = total / PEAK_HBM * 1e3
    log(f"BN stat-pass floor: G sites {g_bytes/1e6:.0f} MB/pass, D "
        f"{d_bytes/1e6:.0f} MB/pass -> {total/1e9:.2f} GB/step required "
        f"by BN train semantics = {floor_vpu:.1f} ms at the {VPU_STREAM/1e9:.0f} "
        f"GB/s VPU stream ceiling ({floor_hbm:.1f} ms at HBM peak); "
        f"measured trace bucket: {GAN_NORM_MS} ms")
    return {"bytes_per_step_gb": total / 1e9, "floor_ms_vpu": floor_vpu,
            "floor_ms_hbm": floor_hbm, "measured_ms": GAN_NORM_MS,
            "ratio_vs_vpu_floor": GAN_NORM_MS / floor_vpu}


# --------------------------------------------------------------- part C
def probe_vae_gemm(rtt: float) -> dict:
    import jax
    import jax.numpy as jnp

    rows = []
    K, N = 517 + 512, 2048  # TorchLSTMCell gate GEMM (x|h concat form)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    def gemm(ww, xx):
        return xx @ ww

    for m in (16, 64, 128, 256, 512):
        x = jnp.asarray(rng.standard_normal((m, K)), jnp.bfloat16)
        t = loop_time(gemm, w, x, rtt)
        fl = 2.0 * m * K * N
        # weight-streaming cap: weights re-read per call at this M
        ai = fl / (K * N * 2.0)
        cap = min(PEAK_TFLOPS, ai * PEAK_HBM) / 1e12
        rows.append({"m": m, "us": t * 1e6, "tflops": fl / t / 1e12,
                     "pct_peak": 100.0 * fl / t / PEAK_TFLOPS,
                     "stream_cap_tflops": cap})
        log(f"LSTM gate GEMM M={m:<4d}: {t*1e6:7.1f} us, "
            f"{fl/t/1e12:6.2f} TFLOP/s ({rows[-1]['pct_peak']:4.1f}% peak; "
            f"weight-stream cap {cap:.1f} TFLOP/s)")
    return {"rows": rows}


# --------------------------------------------------------------- part D
def probe_vae_step(rtt: float, batches) -> dict:
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.train.vae import VAEConfig, VAETrainer

    sys.path.insert(0, str(Path(__file__).parent))
    from probe_train_roofline import _time_trainer, cost_of, report

    out = {}
    for b in batches:
        trainer = VAETrainer(VAEConfig(bf16_encoder=True), jax.random.key(0))
        cfg = trainer.cfg
        rng = np.random.default_rng(0)
        batch = {
            "photo": jnp.asarray(rng.random(
                (b, cfg.image_size, cfg.image_size, 3), np.float32)),
            "sketch_vector": jnp.asarray(rng.random(
                (b, cfg.max_seq_len, 5), np.float32)),
        }
        flops, bts = cost_of(trainer._train.lower(
            trainer.state, batch, jax.random.key(1)).compile())
        secs = _time_trainer(
            lambda i: trainer.train_step(batch, jax.random.key(i)),
            "total_loss", rtt)
        out[b] = report(f"VAE step b{b}", secs, flops, bts, b, "sketch")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="abcd",
                    help="which parts to run (subset of 'abcd')")
    ap.add_argument("--vae_batches", type=int, nargs="+",
                    default=[64, 128])
    ap.add_argument("--gan_b", type=int, default=16,
                    help="GAN conv sweep batch (production 16; lower it "
                         "only for CPU smoke)")
    ap.add_argument("--out", default="results_ann/roofline_close.json")
    ap.add_argument("--cpu", action="store_true",
                    help="smoke on the CPU backend (numbers meaningless)")
    args = ap.parse_args()

    needs_chip = any(p in args.parts for p in "acd") and not args.cpu
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if needs_chip:
        from bench import tpu_reachable

        if not tpu_reachable():
            log("TPU backend unreachable — aborting")
            sys.exit(2)

    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    sys.path.insert(0, str(Path(__file__).parent))
    from probe_train_roofline import measure_rtt  # noqa: E402

    results = {}
    if "b" in args.parts:  # pure arithmetic, no chip needed
        results["bn_floor"] = bn_floor()
    rtt = None
    if any(p in args.parts for p in "acd"):
        rtt = measure_rtt()
        log(f"rtt {rtt*1e3:.1f} ms")
    if "a" in args.parts:
        results["gan_convs"] = probe_gan_convs(rtt, b=args.gan_b)
    if "c" in args.parts:
        results["vae_gemm"] = probe_vae_gemm(rtt)
    if "d" in args.parts:
        results["vae_steps"] = probe_vae_step(rtt, args.vae_batches)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    # merge into an existing artifact so a partial --parts rerun can't
    # drop previously recorded parts (same rule as probe_ann_learned)
    if out.is_file():
        prior = json.loads(out.read_text())
        prior.update(results)
        results = prior
    out.write_text(json.dumps(results, indent=2, sort_keys=True))
    print(json.dumps({k: True for k in results}))
    log(f"written to {out}")


if __name__ == "__main__":
    main()
