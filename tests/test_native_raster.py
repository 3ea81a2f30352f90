"""Native C++ rasterizer vs the python oracle — exact pixel parity."""

import numpy as np
import pytest

from art_sbir_tpu.ops import raster_reference as RR
from art_sbir_tpu.ops.raster_native import available, rasterize_batch_native
from tests.test_ops_rasterize import _random_stroke5

pytestmark = pytest.mark.skipif(not available(), reason="g++ / native build missing")


def test_native_matches_python_oracle_stroke5(rng):
    batch = np.stack([_random_stroke5(rng) for _ in range(6)])
    ours = rasterize_batch_native(batch)
    ref = RR.batch_rasterize_relative_np(batch)
    np.testing.assert_array_equal(ours, ref)


def test_native_matches_python_oracle_stroke3(rng):
    s3 = np.zeros((4, 20, 3), np.float32)
    s3[..., :2] = rng.standard_normal((4, 20, 2)) * 15
    s3[..., 2] = rng.random((4, 20)) < 0.2
    s3[:, -1, 2] = 1
    ours = rasterize_batch_native(s3)
    ref = RR.batch_rasterize_relative_np(s3)
    np.testing.assert_array_equal(ours, ref)


def test_native_is_fast(rng):
    import time

    batch = np.stack([_random_stroke5(rng, t=100, n_valid=90) for _ in range(64)])
    rasterize_batch_native(batch)  # warm
    t0 = time.perf_counter()
    rasterize_batch_native(batch)
    dt = time.perf_counter() - t0
    # reference python loop takes ~10ms+/sketch; native should do 64 well
    # under a second on one core
    assert dt < 1.0, dt
