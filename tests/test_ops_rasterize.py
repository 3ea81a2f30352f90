"""TPU rasterizer vs the host Bresenham golden reference."""

import numpy as np
import jax.numpy as jnp

from art_sbir_tpu.ops import rasterize as R
from art_sbir_tpu.ops import raster_reference as RR


def _random_stroke5(rng, t=40, n_valid=None):
    n_valid = n_valid or rng.integers(8, t)
    s = np.zeros((t, 5), np.float32)
    s[:, :2] = rng.standard_normal((t, 2)) * 12.0
    pen_up = rng.random(t) < 0.15
    s[:, 3] = pen_up
    s[:, 2] = 1 - s[:, 3]
    s[n_valid - 1, 2:] = [0, 0, 1]
    s[n_valid:, :] = 0
    s[n_valid:, 4] = 1
    return s


def test_bresenham_closed_form_matches_generator(rng):
    """Dense coverage formula == sequential Bresenham on random segments."""
    for _ in range(50):
        x0, y0, x1, y1 = rng.integers(1, 64, size=4)
        pts = np.array(RR.bresenham_points(int(x0), int(y0), int(x1), int(y1)))
        p = jnp.array([[[x0, y0], [x1, y1]]], dtype=jnp.int32)
        mask = np.asarray(
            R.rasterize_points(p, jnp.ones((1, 1), bool), side=64)
        )[0]
        ref = np.zeros((64, 64), bool)
        for x, y in pts:
            if 0 < x < 64 and 0 < y < 64:
                ref[y, x] = True
        np.testing.assert_array_equal(mask, ref)


def test_rasterize_points_exact_vs_reference_draw(rng):
    """Given identical integer points, device rasterization is bit-exact."""
    for _ in range(5):
        s5 = _random_stroke5(rng)
        s3 = RR.stroke5_to_stroke3(s5)
        pts, pen = RR.stroke3_to_points(s3)
        ref = RR.binary_dilate_cross_np(RR.draw_points(pts, pen)) * 255.0

        n = len(pts)
        seg = (pen[:-1] == 0).astype(bool)
        from art_sbir_tpu.ops.dilate import binary_dilate_cross

        canvas = R.rasterize_points(
            jnp.array(pts, jnp.int32)[None], jnp.array(seg)[None]
        )
        ours = np.asarray(binary_dilate_cross(canvas)).astype(np.float32) * 255.0
        np.testing.assert_array_equal(ours[0], ref)


def test_full_device_pipeline_close_to_reference(rng):
    """End-to-end stroke-5 batch: f32 scaling can flip boundary pixels only."""
    batch = np.stack([_random_stroke5(rng) for _ in range(4)])
    ours = np.asarray(R.rasterize_strokes(jnp.array(batch)))
    ref = RR.batch_rasterize_relative_np(batch)
    agreement = (ours == ref).mean()
    assert agreement > 0.995, f"pixel agreement {agreement}"


def test_stroke3_input(rng):
    s3 = RR.stroke5_to_stroke3(_random_stroke5(rng))
    ref = RR.rasterize_stroke3_np(s3)
    ours = np.asarray(R.rasterize_strokes(jnp.array(s3[None], jnp.float32)))
    agreement = (ours[0] == ref).mean()
    assert agreement > 0.995


def test_end_token_truncation():
    """Strokes after the end token must not draw."""
    s = np.zeros((10, 5), np.float32)
    s[:, 0] = 10.0
    s[:, 1] = [3, -5, 8, 2, -7, 0, 0, 0, 0, 0]
    s[:, 2] = 1
    s[4, 2:] = [0, 0, 1]  # end at step 4
    s[5:, :2] = 500.0  # would wildly change scaling if included
    a = np.asarray(R.rasterize_strokes(jnp.array(s[None])))
    ref = RR.rasterize_stroke5_np(s)
    np.testing.assert_array_equal(a[0], ref)


def test_host_prepared_pipeline_exact(rng):
    """prepare_points_host (float64 scaling) + device rasterize_points is
    BIT-EXACT vs the reference oracle — the exactness gap of the all-device
    f32 path (its +1e-3 trunc nudge) is closed by pre-computing integer
    points on the host (VectorizedSketchy caches do this)."""
    batch = np.stack([_random_stroke5(rng) for _ in range(6)])
    pts, segs = R.prepare_points_host(batch)
    ours = np.asarray(R.rasterize_prepared(jnp.asarray(pts), jnp.asarray(segs)))
    ref = RR.batch_rasterize_relative_np(batch)
    np.testing.assert_array_equal(ours, ref)


def test_vector_sketchy_serves_exact_raster_points(tmp_path):
    from art_sbir_tpu.data.synthetic import make_synthetic_sketchy
    from art_sbir_tpu.data import get_datasets

    root = make_synthetic_sketchy(tmp_path / "sketchy", with_svg=True)
    train, _ = get_datasets("VectorizedSketchyV1", size=1.0, root=root,
                            img_format="svg")
    it = train.item(0)
    assert it["raster_points"].dtype == np.int32
    assert it["raster_points"].shape[0] == it["sketch_vector"].shape[0] + 1
    assert it["raster_segs"].dtype == bool
    pts, segs = R.prepare_points_host(it["sketch_vector"][None])
    np.testing.assert_array_equal(pts[0], it["raster_points"])
    np.testing.assert_array_equal(segs[0], it["raster_segs"])


def test_device_path_mismatch_bound_golden():
    """The all-device path is EXACT for BOTH stroke families (VERDICT r3
    item 4): prepare_points now runs the O(T) normalization in float64 on
    device (native on CPU, float-float emulated by XLA:TPU) and truncs
    with no nudge, so integer-delta (QuickDraw on-the-fly) AND
    continuous-delta (SVG/Sketchy preview) sketches match the float64
    host oracle pixel-for-pixel. scripts/probe_raster_bound.py measures
    this over a seeded corpus per family and checks it in as a golden.

    This test re-measures a 64-sketch sub-corpus (same generator, same
    seeds) on the CPU backend and holds both families to exact, so a
    regression in prepare_points shows up in-suite."""
    import json
    import sys
    from pathlib import Path

    golden_path = Path(__file__).parent.parent / "goldens" / "raster_device_cpu.json"
    assert golden_path.is_file(), \
        "run `python scripts/probe_raster_bound.py --cpu`"
    golden = json.loads(golden_path.read_text())
    fam = golden["families"]
    # the checked-in contract itself: exact for both families
    assert fam["integer_deltas"]["frac_sketches_exact"] == 1.0
    assert fam["float_deltas"]["frac_sketches_exact"] == 1.0
    assert fam["float_deltas"]["max_mismatch_px"] == 0.0

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    try:
        from probe_raster_bound import make_corpus, measure
    finally:
        sys.path.pop(0)

    stats_int = measure(make_corpus(64, integer=True, seed=7))
    assert stats_int["frac_sketches_exact"] == 1.0, stats_int
    stats_flt = measure(make_corpus(64, integer=False, seed=11))
    assert stats_flt["frac_sketches_exact"] == 1.0, stats_flt
