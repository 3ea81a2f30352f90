"""Pipeline regression goldens (VERDICT round-1 item 7).

``cli/goldens.py`` runs the full train -> embed -> rank -> report pipeline
on a seeded synthetic corpus. The ``ci`` preset re-runs here on the CPU
backend and must reproduce the checked-in ``goldens/ci_cpu.json`` EXACTLY
(same backend + same seeds -> deterministic loader order, negative
sampling, init, and CPU matmuls). The ``scale`` preset's TPU golden
(``goldens/scale_tpu.json``) is validated structurally — bf16 TPU numerics
are not reproducible on the CPU suite, but the recorded run must satisfy
the >= 5k gallery / >= 1k queries contract with sane metrics.
"""

import json
import math
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
GOLDENS = REPO / "goldens"


def test_scale_tpu_golden_contract():
    path = GOLDENS / "scale_tpu.json"
    assert path.is_file(), "goldens/scale_tpu.json missing - run " \
        "`python -m art_sbir_tpu.cli.goldens --preset scale` on the TPU chip"
    g = json.loads(path.read_text())
    assert g["backend"] != "cpu"
    assert g["n_gallery"] >= 5000
    assert g["n_queries"] >= 1000
    assert 0.0 < g["mrr"] <= 1.0
    assert len(g["topk_acc"]) == 10
    assert all(0.0 <= a <= 1.0 for a in g["topk_acc"])
    assert g["topk_acc"] == sorted(g["topk_acc"])  # recall@k is monotone
    assert 1.0 <= g["rank_mean"] <= g["n_gallery"]
    assert math.isfinite(g["final_train_loss"])
    assert g["wall_times_s"]["train_embed_rank_report"] > 0


@pytest.mark.slow
def test_ci_preset_reproduces_golden(tmp_path):
    path = GOLDENS / "ci_cpu.json"
    assert path.is_file(), "goldens/ci_cpu.json missing - run " \
        "`python -m art_sbir_tpu.cli.goldens --preset ci` on this backend"
    want = json.loads(path.read_text())
    assert want["backend"] == "cpu"

    from art_sbir_tpu.cli.goldens import run

    got = run("ci", tmp_path / "data", tmp_path / "results",
              seed=want["seed"])
    assert got["n_gallery"] == want["n_gallery"]
    assert got["n_queries"] == want["n_queries"]
    assert got["mrr"] == pytest.approx(want["mrr"], rel=1e-6)
    assert got["topk_acc"] == pytest.approx(want["topk_acc"], rel=1e-6)
    assert got["rank_mean"] == pytest.approx(want["rank_mean"], rel=1e-6)
    assert got["final_train_loss"] == pytest.approx(
        want["final_train_loss"], rel=1e-5)
    assert got["final_test_loss"] == pytest.approx(
        want["final_test_loss"], rel=1e-5)
