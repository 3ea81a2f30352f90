"""Diagnose float-delta sketches whose device ints differ from the
host-f64 oracle on TPU. Finds the sketch, the point, and prints both
paths' scaled values at full precision.

RESOLVED (round 4): two sketches mismatched, both with host values a few
1e-6 BELOW an integer (e.g. 216.99999623817985 -> device 217). Every f64
arithmetic op on TPU measures <=4e-14 relative (float-float emulation),
so the culprit was the f64->s32 CAST: it resolves through the
float-float HI component, which is the value rounded to nearest f32 —
anything within an f32 half-ulp of an integer rounds UP before the
truncation. Fix in ops/rasterize.py: explicit floor with +-1 integer
correction against f64 comparisons (plus a 1e-9 landing guard); both
stroke families now measure 2048/2048 exact on both backends."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

from probe_raster_bound import make_corpus


def main() -> None:
    from art_sbir_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    print("building corpus + host oracle...", flush=True)
    batch = make_corpus(2048, integer=False, seed=0)
    import jax
    import jax.numpy as jnp
    from art_sbir_tpu.ops.rasterize import prepare_points, prepare_points_host

    h_pts, h_seg = prepare_points_host(batch)
    print("host done; devices:", jax.devices(), flush=True)
    for s in range(0, 2048, 256):
        print(f"chunk {s}", flush=True)
        sub = batch[s:s + 256]
        d_pts, d_seg = jax.jit(prepare_points)(jnp.asarray(sub))
        d_pts = np.asarray(d_pts)
        bad = np.nonzero((d_pts != h_pts[s:s + 256]).any(axis=(1, 2)))[0]
        for i in bad:
            gi = s + int(i)
            diff = np.nonzero((d_pts[i] != h_pts[gi]).any(axis=1))[0]
            print(f"sketch {gi}: {len(diff)} differing points")
            stroke = batch[gi].astype(np.float64)
            t = stroke.shape[0]
            rows = np.arange(t)
            end = stroke[:, 4] > 0
            idx = int(np.argmax(end))
            l = idx if (end.any() and idx > 0) else t - 1
            valid = rows <= l
            xy = np.where(valid[:, None], stroke[:, :2], 0.0)
            pts = np.concatenate([np.zeros((1, 2)), xy]).cumsum(axis=0)
            vext = np.concatenate([[True], valid])
            lo = pts[vext].min(axis=0)
            hi = pts[vext].max(axis=0)
            rng = np.where(hi - lo > 0, hi - lo, 1.0)
            scaled = (pts - lo) / rng * 195.0 + 30.0
            for j in diff[:8]:
                print(f"  point {j}: host_int={h_pts[gi][j]} "
                      f"dev_int={d_pts[i][j]}")
                print(f"    host scaled = {scaled[j][0]!r}, {scaled[j][1]!r}")
                print(f"    pts64={pts[j]!r} lo={lo!r} hi={hi!r} rng={rng!r}")


if __name__ == "__main__":
    main()
