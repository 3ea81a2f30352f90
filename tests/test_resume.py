"""Mid-training checkpoint/resume through the train CLI (tiny, CPU)."""

import json
from pathlib import Path

import numpy as np
import pytest

from art_sbir_tpu.data.synthetic import make_synthetic_sketchy


@pytest.fixture(scope="module")
def sketchy_root(tmp_path_factory):
    return make_synthetic_sketchy(tmp_path_factory.mktemp("sketchy"))


def test_train_checkpoint_and_resume(sketchy_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from art_sbir_tpu.cli.train import main

    common = [
        "-b", "4", "-d", "SketchyV1", "--model_type", "ModifiedResNet",
        "--data_root", str(sketchy_root), "--image_size", "64",
        "--results_root", str(tmp_path / "results"),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ]
    out1 = main(["-e", "1"] + common)
    t1 = json.loads((out1 / "training.json").read_text())
    assert t1["steps"] > 0 and t1["mean_step_time"] > 0
    assert (tmp_path / "ckpt" / "1").exists()

    # resume to epoch 2: trains exactly one more epoch
    out2 = main(["-e", "2", "--resume"] + common)
    t2 = json.loads((out2 / "training.json").read_text())
    assert len(t2["train_losses"]) == 1  # epochs 1..2 with start_epoch=1
    assert np.isfinite(t2["train_losses"][0])
    assert (tmp_path / "ckpt" / "2").exists()


def test_pix2pix_checkpoint_and_continue_train(sketchy_root, tmp_path,
                                               monkeypatch):
    """Epoch-tagged GAN checkpoints + --continue_train (reference BaseModel
    save_networks/load_networks, pix2pix_model.py:90-101,150-205)."""
    monkeypatch.chdir(tmp_path)
    from art_sbir_tpu.cli.pix2pix import main

    common = [
        "--mode", "train", "-b", "4", "--dataset", "SketchyPix2Pix",
        "--data_root", str(sketchy_root), "--image_size", "64",
        "--ngf", "8", "--ndf", "8", "-s", "1.0",
        "--checkpoint_dir", str(tmp_path / "gan_ckpt"),
    ]
    main(["-e", "1"] + common)
    assert (tmp_path / "gan_ckpt" / "1").exists()

    main(["-e", "2", "--continue_train"] + common)
    assert (tmp_path / "gan_ckpt" / "2").exists()
