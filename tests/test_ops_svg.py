"""SVG parse/build vs the reference handler (imported read-only as oracle)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

from art_sbir_tpu.data.synthetic import _svg
from art_sbir_tpu.ops import svg as S

REF = Path("/root/reference/semiSupervised_utils/svg_handler.py")


def _load_reference_handler():
    spec = importlib.util.spec_from_file_location("ref_svg_handler", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_svg_handler"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_parse_svg_roundtrip(tmp_path):
    f = tmp_path / "a.svg"
    f.write_text(_svg(3))
    out = S.parse_svg(f, tmp_path, reduce_factor=2, max_length=100)
    img = np.asarray(out["image"])
    assert img.shape[1] == 5
    assert out["shape"] == (640, 480)
    assert (tmp_path / "a.json").is_file()
    # pen states: each row is line xor move, last column zero
    assert np.all(img[:, 2] + img[:, 3] == 1)
    assert np.all(img[:, 4] == 0)


def test_reduce_strokes_merges_pen_down_runs():
    sketch = [[1.0, 1.0, 1, 0, 0]] * 6 + [[5.0, 0.0, 0, 1, 0]] + [[1.0, 1.0, 1, 0, 0]] * 4
    red = S.reduce_strokes([r[:] for r in sketch], factor=2, max_length=4)
    assert len(red) < len(sketch)
    # total delta preserved
    assert abs(sum(r[0] for r in red) - sum(r[0] for r in sketch)) < 1e-9


def test_build_svg_stops_at_end_token():
    rows = [[3, 4, 1, 0, 0], [5, 6, 0, 1, 0], [0, 0, 0, 0, 1], [9, 9, 1, 0, 0]]
    svg = S.build_svg(rows, (256, 256))
    assert "l3,4" in svg and "m5,6" in svg and "9,9" not in svg


def test_reshape_vector_sketch_scales_to_canvas():
    v = {"shape": (640, 480), "image": [[64.0, 48.0, 1, 0, 0]]}
    out = S.reshape_vector_sketch(v)
    np.testing.assert_allclose(np.asarray(out["image"])[0, :2], [25.6, 25.6])
    assert out["shape"] == (256, 256)


@pytest.mark.skipif(not REF.is_file(), reason="reference not mounted")
def test_parse_svg_matches_reference_handler(tmp_path):
    """Oracle test: identical stroke-5 output on synthetic sketchy-style
    SVGs (reference module imported read-only, never copied)."""
    ref = _load_reference_handler()
    for seed in range(5):
        f = tmp_path / f"s{seed}.svg"
        f.write_text(_svg(seed * 7))
        ours = S.parse_svg(f, reduce_factor=2, max_length=100)
        theirs = ref.parse_svg(str(f), None, reduce_factor=2, max_length=100)
        a = np.asarray(ours["image"], np.float64)
        b = np.asarray(theirs["image"], np.float64)
        assert a.shape == b.shape, (a.shape, b.shape)
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9)
        assert ours["shape"] == tuple(theirs["shape"])
        assert ours["original_length"] == theirs["original_length"]
