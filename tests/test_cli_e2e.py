"""End-to-end CLI smoke on synthetic corpora: the minimum slice of SURVEY.md
§7 — train ModifiedResNet on (synthetic) Sketchy, run retrieval inference,
check the 4-JSON results contract + plots. Tiny shapes on CPU."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from art_sbir_tpu.data.synthetic import make_synthetic_kaggle, make_synthetic_sketchy


@pytest.fixture(scope="module")
def sketchy_root(tmp_path_factory):
    return make_synthetic_sketchy(tmp_path_factory.mktemp("sketchy"))


def test_train_cli_end_to_end(sketchy_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from art_sbir_tpu.cli.train import main

    out = main([
        "-e", "1", "-b", "4", "-d", "SketchyV1", "--model_type", "ModifiedResNet",
        "--data_root", str(sketchy_root), "--image_size", "64",
        "--inference", "--results_root", str(tmp_path / "results"),
    ])
    for name in ("data_params", "training", "training_params", "inference"):
        f = out / f"{name}.json"
        assert f.is_file(), name
    training = json.loads((out / "training.json").read_text())
    assert len(training["train_losses"]) == 1
    assert np.isfinite(training["train_losses"][0])
    inference = json.loads((out / "inference.json").read_text())
    assert 0.0 <= inference["mean_reciprocal_rank"] <= 1.0
    assert len(inference["topk_acc"]) == 10
    # flagship default geometry = reference model.transform parity, and the
    # choice is recorded in the results contract
    data_params = json.loads((out / "data_params.json").read_text())
    assert data_params["resize_mode"] == "shortest_crop"
    training_params = json.loads((out / "training_params.json").read_text())
    assert training_params["resize_mode"] == "shortest_crop"
    assert (out / "losses.png").is_file()
    assert (out / "topk_acc.png").is_file()
    # embeddings cache written
    assert any(Path("data/image_features").iterdir())


def test_train_cli_bn_recalibrate(sketchy_root, tmp_path, monkeypatch):
    """--bn_recalibrate per_modality: post-training sweep runs, the
    training contract records it, queries embed with sketch-population
    stats (train.bn; VERDICT r3 item 5), and the sketch-stats sibling
    export lands next to the model."""
    monkeypatch.chdir(tmp_path)
    from art_sbir_tpu.cli.train import main

    out = main([
        "-e", "1", "-b", "4", "-d", "SketchyV1",
        "--model_type", "ModifiedResNet", "--width", "8",
        "--layers", "1", "1", "1", "1",
        "--data_root", str(sketchy_root), "--image_size", "64",
        "--inference", "--bn_recalibrate", "per_modality",
        "--results_root", str(tmp_path / "results"),
    ])
    training = json.loads((out / "training.json").read_text())
    assert training["bn_recalibrate"] == "per_modality"
    inference = json.loads((out / "inference.json").read_text())
    assert 0.0 <= inference["mean_reciprocal_rank"] <= 1.0
    assert (Path("models") / f"{out.name}_bn_sketch").is_dir()


def test_visualize_contract(tmp_path):
    from art_sbir_tpu.viz.plots import visualize

    training = {
        "train_losses": [1.0, 0.5], "test_losses": [1.1, 0.6],
        "itrain_losses": [1.0, 0.9], "itest_losses": [1.0, 0.8],
        "iteration_loss_frequency": 10,
    }
    inference = {
        "topk_acc": [0.1 * i for i in range(1, 11)],
        "retrieval_samples": [{"q-1.png": [("g.jpg", 0.5)]}],
    }
    visualize(tmp_path, training, inference)
    assert (tmp_path / "losses.png").is_file()
    assert (tmp_path / "iteration_losses.png").is_file()
    assert (tmp_path / "topk_acc.png").is_file()
    assert (tmp_path / "retrieval_samples.png").is_file()
