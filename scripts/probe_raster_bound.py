"""Verify the all-device rasterizer is EXACT against the float64
host-exact path for both stroke families (VERDICT r3 item 4).

`ops/rasterize.py::prepare_points` runs the reference's float64 range
normalization (rasterize.py:170-191) ON DEVICE — native f64 on CPU,
float-float emulated by XLA:TPU (~1e-14 relative) — then truncs with no
nudge; a mismatch vs the host oracle would need the exact rational value
within ~3e-12 of an integer. This probe MEASURES that contract over a
large seeded corpus per family:

* integer-delta strokes (QuickDraw-style): scaled points sit >= 1/range
  from a trunc boundary except exact integer landings;
* float-delta strokes (SVG/Sketchy-style continuous deltas).

For each family: rasterize via the pure-device path (`rasterize_strokes`)
and the host-exact path (`prepare_points_host` + `rasterize_prepared`),
count mismatching pixels per sketch (post-dilate, the shipped form).

Writes goldens/raster_device_<backend>.json. Run on the TPU chip for the
production bound; tests/test_ops_rasterize.py asserts the CPU-backend rate
against the same ceiling.
"""

import argparse
import json
from pathlib import Path

import numpy as np


def make_corpus(n: int, t: int = 100, integer: bool = True,
                seed: int = 0) -> np.ndarray:
    """Seeded stroke-5 batch: segmented random walks, pen lifts, end token."""
    rng = np.random.default_rng(seed)
    out = np.zeros((n, t, 5), np.float32)
    for i in range(n):
        length = int(rng.integers(t // 2, t))
        if integer:
            deltas = rng.integers(-25, 26, (length, 2)).astype(np.float32)
        else:
            deltas = (rng.standard_normal((length, 2)) * 12.0).astype(np.float32)
        out[i, :length, :2] = deltas
        lifts = rng.random(length) < 0.08
        out[i, :length, 3] = lifts
        out[i, :length, 2] = ~lifts
        out[i, length - 1, 2:] = (0, 0, 1)  # end token
    return out


def measure(batch: np.ndarray, chunk: int = 256) -> dict:
    import jax.numpy as jnp

    from art_sbir_tpu.ops.rasterize import (prepare_points_host,
                                            rasterize_prepared,
                                            rasterize_strokes)

    n = len(batch)
    mism = np.zeros(n)
    for s in range(0, n, chunk):
        sub = batch[s:s + chunk]
        dev = np.asarray(rasterize_strokes(jnp.asarray(sub)))
        pts, seg = prepare_points_host(sub)
        exact = np.asarray(rasterize_prepared(jnp.asarray(pts),
                                              jnp.asarray(seg)))
        mism[s:s + chunk] = (dev != exact).reshape(len(sub), -1).sum(1)
    return {
        "n_sketches": n,
        "mean_mismatch_px": float(mism.mean()),
        "p99_mismatch_px": float(np.percentile(mism, 99)),
        "max_mismatch_px": float(mism.max()),
        "frac_sketches_exact": float((mism == 0).mean()),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("n", nargs="?", type=int, default=2048)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon plugin ignores "
                        "JAX_PLATFORMS; config route required)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    n = args.n
    golden = {"backend": jax.default_backend(), "canvas": 256,
              "families": {}}
    for name, integer in (("integer_deltas", True), ("float_deltas", False)):
        stats = measure(make_corpus(n, integer=integer,
                                    seed=7 if integer else 11))
        golden["families"][name] = stats
        print(name, json.dumps(stats), flush=True)
    out = Path(f"goldens/raster_device_{golden['backend']}.json")
    out.write_text(json.dumps(golden, indent=2, sort_keys=True))
    print(f"written {out}", flush=True)


if __name__ == "__main__":
    main()
