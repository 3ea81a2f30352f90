"""End-to-end runs of the remaining entry points: the standalone
inference re-evaluation CLI (reference `inference.py:167-244`) and the
AdaIN artwork-generation CLI (reference `artwork_gen.py`)."""

import json
from pathlib import Path

import numpy as np
from PIL import Image

from art_sbir_tpu.data.synthetic import make_synthetic_sketchy


def test_inference_cli_reruns_saved_model(tmp_path, monkeypatch):
    """Train a tiny run via the train CLI, then re-evaluate the saved
    checkpoint with cli.inference --folder and compare the regenerated
    metrics with the original run's (same data/split/weights -> equal)."""
    monkeypatch.chdir(tmp_path)
    root = make_synthetic_sketchy(tmp_path / "sketchy", n_classes=3)
    from art_sbir_tpu.cli import inference, train

    out = train.main([
        "-e", "1", "-b", "4", "-d", "SketchyV2",
        "--model_type", "ModifiedResNet_with_classification",
        "--num_classes", "3", "--data_root", str(root),
        "--image_size", "64", "--inference",
    ])
    folder = out.name
    orig = json.loads((out / "inference.json").read_text())
    orig_stats = orig.get("drawing_stats", orig)

    inference.main(["--folder", folder, "--data_root", str(root)])
    rerun = json.loads((out / "inference.json").read_text())
    rerun_stats = rerun.get("drawing_stats", rerun)
    assert rerun_stats["size"] == orig_stats["size"]
    np.testing.assert_allclose(rerun_stats["mean_reciprocal_rank"],
                               orig_stats["mean_reciprocal_rank"], rtol=1e-5)
    assert rerun_stats["topk_acc"] == orig_stats["topk_acc"]


def test_artwork_gen_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    content, style = tmp_path / "content", tmp_path / "style"
    content.mkdir(); style.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (80, 96, 3), np.uint8)).save(
            content / f"c{i}.jpg")
    Image.fromarray(rng.integers(0, 256, (64, 64, 3), np.uint8)).save(
        style / "s0.jpg")

    from art_sbir_tpu.cli import artwork_gen

    artwork_gen.main([
        "--content_dir", str(content), "--style_dir", str(style),
        "--out_dir", str(tmp_path / "styled"), "--image_size", "64",
        "-b", "2",
    ])
    outs = list((tmp_path / "styled").glob("*"))
    assert len(outs) == 3
    img = np.asarray(Image.open(outs[0]).convert("RGB"))
    assert img.shape == (64, 64, 3)
