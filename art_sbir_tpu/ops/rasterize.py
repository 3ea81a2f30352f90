"""Batched stroke rasterization on TPU.

The reference rasterizes each sketch with a per-pixel Python Bresenham loop
inside ``__getitem__`` (reference `semiSupervised_utils/rasterize.py:131-149`,
called from `data_preparation.py:280-294`) — the single hottest CPU path in
its VAE pipeline. Here rasterization is a fixed-shape, batched device op:

* ``prepare_points``: stroke-5 -> absolute integer canvas points + segment
  mask (pure jnp, fused elementwise);
* ``rasterize_points``: dense Bresenham *coverage test* — instead of walking
  pixels sequentially, every (pixel, segment) pair is tested against the
  closed form of the Bresenham recurrence, a pure VPU computation with no
  scatter and no data-dependent control flow:

      along the driving axis, step j selects minor coordinate
      m(j) = floor((2*d_minor*j + d_major) / (2*d_major)),

  which reproduces the classic integer algorithm's pixel set exactly.
* cross-shaped binary dilation (scipy parity) fused on top.

Exact-parity oracle: :mod:`art_sbir_tpu.ops.raster_reference`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from art_sbir_tpu.ops.dilate import binary_dilate_cross

CANVAS = 256
LO, HI = 30.0, 225.0


def _prepare_single(stroke: jax.Array, is_stroke5: bool) -> tuple[jax.Array, jax.Array]:
    """One sketch (T, 5)/(T, 3) -> points (T+1, 2) int32, seg_draw (T,) bool.

    Segment i connects points[i] -> points[i+1]; drawn iff seg_draw[i].
    Reproduces `to_normal_strokes` + `to_stroke_list` (reference
    rasterize.py:154-191): truncate at the end token, prepend the origin,
    cumsum to absolute coords, min/max-normalize into [30, 225], int cast.
    """
    t = stroke.shape[0]
    rows = jnp.arange(t)
    if is_stroke5:
        end = stroke[:, 4] > 0
        idx = jnp.argmax(end)
        has = jnp.any(end)
        l = jnp.where(has & (idx > 0), idx, t - 1)
        pen = jnp.where(rows == l, 1.0, stroke[:, 3])
    else:
        l = t - 1
        pen = stroke[:, 2]
    valid = rows <= l

    xy = jnp.where(valid[:, None], stroke[:, :2], 0.0)
    xy_ext = jnp.concatenate([jnp.zeros((1, 2), stroke.dtype), xy], axis=0)
    pen_ext = jnp.concatenate([jnp.zeros((1,), pen.dtype), pen], axis=0)
    valid_ext = jnp.concatenate([jnp.ones((1,), bool), valid], axis=0)

    # The reference normalizes in float64 (np.vstack promotes the f32
    # strokes, rasterize.py:170-181); f32 on device flipped the trunc for
    # ~13% of continuous-delta sketches (round-2 goldens). Run the O(T)
    # normalization in f64 — native on CPU, float-float EMULATED by
    # XLA:TPU (div/mul/cumsum all measured <=4e-14 relative, round 4) —
    # then take the floor EXPLICITLY. The naive `.astype(int32)` is NOT
    # safe on TPU: the emulation's f64->s32 cast resolves through the
    # float-float HI component, which ROUNDS any value within an f32
    # half-ulp of an integer (measured: scaled = 216.99999623 -> hi
    # 217.0f -> 217, vs the host oracle's 216). Floor-with-correction
    # below fixes that cast bug exactly; the +1e-9 landing guard then
    # absorbs the emulation's own ~1e-13 jitter at values that land
    # EXACTLY on integers (per-axis extremes -> 30/225, and integer-delta
    # landings where range | 195*(pt-lo)). Divergence from the host
    # oracle now requires the exact rational value to sit within 1e-9
    # BELOW an integer — probability ~1e-9/point for continuous deltas,
    # impossible for non-landing integer deltas; both families measure
    # frac_sketches_exact = 1.0 on both backends
    # (goldens/raster_device_*.json, scripts/probe_raster_bound.py).
    # The O(T*H*W) coverage test below stays in int32/f32.
    with jax.enable_x64(True):
        pts64 = jnp.cumsum(xy_ext.astype(jnp.float64), axis=0)
        big = jnp.float64(1e30)
        lo = jnp.min(jnp.where(valid_ext[:, None], pts64, big), axis=0)
        hi = jnp.max(jnp.where(valid_ext[:, None], pts64, -big), axis=0)
        # reference divides by zero here; keep the guarded form
        rng = jnp.where(hi - lo > 0, hi - lo, jnp.float64(1.0))
        scaled = (pts64 - lo) / rng * jnp.float64(HI - LO) + jnp.float64(LO)
        # floor(scaled + 1e-9) without trusting the cast: any sane cast
        # lands within +-1 of the true floor; int->f64 is exact for these
        # magnitudes and float-float comparisons are accurate to ~1e-13,
        # so the two corrections decide the boundary exactly vs the guard
        c0 = scaled.astype(jnp.int32)
        cf = c0.astype(jnp.float64)
        s9 = scaled + jnp.float64(1e-9)
        ipts = (c0
                - (cf > s9).astype(jnp.int32)
                + (cf + 1.0 <= s9).astype(jnp.int32))

    seg_draw = valid & (pen_ext[:-1] == 0)
    return ipts, seg_draw


def prepare_points(batch: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, T, 5) or (B, T, 3) stroke batch -> ((B, T+1, 2) int32, (B, T) bool)."""
    is5 = batch.shape[-1] == 5
    return jax.vmap(lambda s: _prepare_single(s, is5))(batch)


def _segments_mask(
    p0: jax.Array, p1: jax.Array, draw: jax.Array, side: int
) -> jax.Array:
    """Dense coverage of S segments -> (side, side) bool.

    p0, p1: (S, 2) int32 endpoints; draw: (S,) bool. Broadcasts segment
    scalars against the pixel grid: (S, side, side) comparisons, any-reduced
    over S. All integer VPU ops.
    """
    gx = jax.lax.broadcasted_iota(jnp.int32, (side, side), 1)[None]  # (1, H, W)
    gy = jax.lax.broadcasted_iota(jnp.int32, (side, side), 0)[None]

    x0 = p0[:, 0][:, None, None]
    y0 = p0[:, 1][:, None, None]
    x1 = p1[:, 0][:, None, None]
    y1 = p1[:, 1][:, None, None]

    dx, dy = x1 - x0, y1 - y0
    adx, ady = jnp.abs(dx), jnp.abs(dy)
    xsign = jnp.where(dx > 0, 1, -1)
    ysign = jnp.where(dy > 0, 1, -1)
    x_driving = adx > ady

    # The Bresenham minor coordinate at driving step j is
    # m = (2*a_minor*j + a_major) // den with den = max(2*a_major, 1); a
    # pixel is on the line iff its own minor offset equals that floor
    # division. Integer division has no native VPU lowering, so test the
    # equivalent pure-multiply band instead:
    #   m == num // den  <=>  den*m <= num < den*m + den
    # (exact for j >= 0, den > 0 — out-of-range j is masked separately).

    # x-driving: j along x, minor = y
    jx = (gx - x0) * xsign
    mx = (gy - y0) * ysign
    num_x = 2 * ady * jx + adx
    den_x = jnp.maximum(2 * adx, 1)
    band_x = den_x * mx
    on_x = ((jx >= 0) & (jx <= adx)
            & (band_x <= num_x) & (num_x < band_x + den_x))

    # y-driving: j along y, minor = x
    jy = (gy - y0) * ysign
    my = (gx - x0) * xsign
    num_y = 2 * adx * jy + ady
    den_y = jnp.maximum(2 * ady, 1)
    band_y = den_y * my
    on_y = ((jy >= 0) & (jy <= ady)
            & (band_y <= num_y) & (num_y < band_y + den_y))

    on = jnp.where(x_driving, on_x, on_y) & draw[:, None, None]
    return jnp.any(on, axis=0)


def rasterize_points(
    points: jax.Array, seg_draw: jax.Array, side: int = CANVAS, seg_chunk: int = 16
) -> jax.Array:
    """(B, N, 2) int points + (B, N-1) segment mask -> (B, side, side) bool.

    Scans over segment chunks (each chunk a dense (chunk, H, W) coverage
    test) so VMEM working set stays bounded while the VPU sees large arrays.
    Pixels on row/column zero are never written (reference bound check
    `cord[0] > 0 and cord[1] > 0`, rasterize.py:141).
    """
    b, n, _ = points.shape
    s = n - 1
    pad = (-s) % seg_chunk
    p0 = jnp.pad(points[:, :-1], ((0, 0), (0, pad), (0, 0)))
    p1 = jnp.pad(points[:, 1:], ((0, 0), (0, pad), (0, 0)))
    dm = jnp.pad(seg_draw, ((0, 0), (0, pad)))
    nchunk = (s + pad) // seg_chunk
    p0 = p0.reshape(b, nchunk, seg_chunk, 2).swapaxes(0, 1)
    p1 = p1.reshape(b, nchunk, seg_chunk, 2).swapaxes(0, 1)
    dm = dm.reshape(b, nchunk, seg_chunk).swapaxes(0, 1)

    seg_fn = jax.vmap(functools.partial(_segments_mask, side=side))

    def body(canvas, chunk):
        c0, c1, cd = chunk
        return canvas | seg_fn(c0, c1, cd), None

    init = jnp.zeros((b, side, side), bool)
    canvas, _ = jax.lax.scan(body, init, (p0, p1, dm))

    gx = jax.lax.broadcasted_iota(jnp.int32, (side, side), 1)
    gy = jax.lax.broadcasted_iota(jnp.int32, (side, side), 0)
    return canvas & ((gx > 0) & (gy > 0))[None]


def prepare_points_host(batch) -> tuple:
    """Float64 host mirror of :func:`prepare_points` — EXACT reference
    scaling semantics (the reference normalizes in numpy float64,
    rasterize.py:170-191; the device path now matches it in device f64,
    measured exact on both backends — see the probe). Use this to
    pre-compute integer canvas points for dataset caches
    (`data/vector_sketchy.py`), then rasterize on device with
    :func:`rasterize_points` — the combination is bit-exact vs the oracle
    (`ops/raster_reference.py`), tested in tests/test_ops_rasterize.py.

    (B, T, 5|3) float array -> ((B, T+1, 2) int32, (B, T) bool).
    """
    import numpy as np

    batch = np.asarray(batch, np.float64)
    b, t, ch = batch.shape
    pts_out = np.zeros((b, t + 1, 2), np.int32)
    seg_out = np.zeros((b, t), bool)
    rows = np.arange(t)
    for i in range(b):
        stroke = batch[i]
        if ch == 5:
            end = stroke[:, 4] > 0
            idx = int(np.argmax(end))
            l = idx if (end.any() and idx > 0) else t - 1
            pen = stroke[:, 3].copy()
            pen[l] = 1.0
        else:
            l = t - 1
            pen = stroke[:, 2]
        valid = rows <= l
        xy = np.where(valid[:, None], stroke[:, :2], 0.0)
        pts = np.concatenate([np.zeros((1, 2)), xy]).cumsum(axis=0)
        vext = np.concatenate([[True], valid])
        lo = pts[vext].min(axis=0)
        hi = pts[vext].max(axis=0)
        rng = np.where(hi - lo > 0, hi - lo, 1.0)
        scaled = (pts - lo) / rng * (HI - LO) + LO
        pts_out[i] = scaled.astype(np.int32)
        pen_ext = np.concatenate([[0.0], pen])
        seg_out[i] = valid & (pen_ext[:-1] == 0)
    return pts_out, seg_out


def rasterize_prepared(
    points: jax.Array, seg_draw: jax.Array, side: int = CANVAS,
    dilate: bool = True,
) -> jax.Array:
    """Device rasterization of pre-computed integer points (see
    :func:`prepare_points_host`): (B, N, 2) + (B, N-1) -> 0/255 float."""
    canvas = rasterize_points(points, seg_draw, side=side)
    if dilate:
        canvas = binary_dilate_cross(canvas)
    return canvas.astype(jnp.float32) * 255.0


@functools.partial(jax.jit, static_argnames=("side", "dilate"))
def rasterize_strokes(
    batch: jax.Array, side: int = CANVAS, dilate: bool = True
) -> jax.Array:
    """Full pipeline: (B, T, 5|3) strokes -> (B, side, side) float32 0/255.

    Matches `batch_rasterize_relative` (reference rasterize.py:152-205) up to
    float32-vs-float64 rounding in the range normalization; exact given
    identical integer points (see tests).
    """
    pts, seg = prepare_points(batch)
    canvas = rasterize_points(pts, seg, side=side)
    if dilate:
        canvas = binary_dilate_cross(canvas)
    return canvas.astype(jnp.float32) * 255.0
