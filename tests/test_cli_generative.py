"""End-to-end CLI runs for the generative surfaces (CPU, synthetic data):
the Photo2Sketch VAE trainer (reference `semiSupervised_main.py`) including
the exact-raster cached-points batch path, and the drawings batch-inference
CLI (reference `drawings_main.py`/`create_drawings.py`) for both corpora.
"""

import json
import math
from pathlib import Path

import numpy as np

from art_sbir_tpu.data.synthetic import make_synthetic_kaggle, make_synthetic_sketchy


def _p2s_args(extra):
    return [
        "--setup", "Sketchy", "--batchsize", "4", "--max_epoch", "1",
        "--save_rate", "1", "--size", "1.0", "--dec_rnn_size", "32",
        "--z_size", "8", "--num_mixture", "3",
    ] + extra


def test_photo2sketch_cli_svg_exact_raster_path(tmp_path, monkeypatch):
    """img_format=svg serves cached exact integer raster points
    (data/vector_sketchy.py) -> the CLI's rasterize_prepared branch."""
    monkeypatch.chdir(tmp_path)
    # minimal corpus: the 256^2 VGG encoder costs ~14 s/image fwd+bwd on
    # this one-core CPU (see the quickdraw test note)
    root = make_synthetic_sketchy(tmp_path / "sketchy", n_classes=2,
                                  photos_per_class=2, with_svg=True)
    from art_sbir_tpu.cli import photo2sketch

    photo2sketch.main(_p2s_args(
        ["--img_format", "svg", "--data_root", str(root)]))

    runs = list((tmp_path / "results").iterdir())
    assert len(runs) == 1
    training = json.loads((runs[0] / "training.json").read_text())
    for k in ("total_loss", "kl_loss", "reconstruction_loss"):
        assert math.isfinite(training["train_losses"][k][-1])
        assert math.isfinite(training["test_losses"][k][-1])
    assert list(runs[0].glob("sample_1_*.svg"))
    assert list(runs[0].glob("sample_1_*.json"))
    assert (runs[0] / "samples_1.png").is_file()
    assert list((tmp_path / "models").iterdir())  # orbax checkpoint saved


def test_drawings_cli_both_corpora(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    kroot = make_synthetic_kaggle(tmp_path / "kaggle")
    sroot = make_synthetic_sketchy(tmp_path / "sketchy")
    from art_sbir_tpu.cli import drawings

    drawings.main(["--corpus", "kaggle", "--data_root", str(kroot),
                   "--image_size", "64", "-b", "4"])
    out = list((kroot / "contour_drawings").glob("*.png"))
    assert out, "no kaggle drawings written"
    from PIL import Image

    img = Image.open(out[0])
    assert img.size == (64, 64) and img.mode == "L"

    drawings.main(["--corpus", "sketchy", "--data_root", str(sroot),
                   "--image_size", "64", "-b", "4", "--name", "opensketch"])
    shard_dirs = [d for d in (sroot / "opensketch_drawings").iterdir()
                  if d.is_dir()]
    assert shard_dirs and all(list(d.glob("*.png")) for d in shard_dirs)


def test_drawings_cli_bf16_close_to_f32(tmp_path, monkeypatch):
    """--bf16 halves generator precision for throughput; drawings must
    stay visually equivalent (uint8 outputs within a few quantization
    steps of the f32 sweep)."""
    monkeypatch.chdir(tmp_path)
    kroot = make_synthetic_kaggle(tmp_path / "kaggle")
    from PIL import Image

    from art_sbir_tpu.cli import drawings

    drawings.main(["--corpus", "kaggle", "--data_root", str(kroot),
                   "--image_size", "64", "-b", "4", "--name", "contour"])
    drawings.main(["--corpus", "kaggle", "--data_root", str(kroot),
                   "--image_size", "64", "-b", "4", "--name", "anime",
                   "--bf16"])
    f32s = sorted((kroot / "contour_drawings").glob("*.png"))
    b16s = sorted((kroot / "anime_drawings").glob("*.png"))
    assert len(f32s) == len(b16s) > 0
    diffs = []
    for a, b in zip(f32s, b16s):
        ia = np.asarray(Image.open(a), np.int32)
        ib = np.asarray(Image.open(b), np.int32)
        diffs.append(np.abs(ia - ib).mean())
    assert max(diffs) < 6.0, diffs  # fresh-init nets; bf16 noise only


def test_photo2sketch_cli_quickdraw_setup(tmp_path, monkeypatch):
    """--setup Quickdraw: stroke-3 npz archives, photos rasterized on
    device per batch (rasterize_strokes path, reference
    semiSupervised_main.py Quickdraw branch)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    d = tmp_path / "quick_draw"
    d.mkdir()
    seqs = np.empty(24, object)
    for i in range(24):
        n = int(rng.integers(12, 60))
        s = np.zeros((n, 3), np.float32)
        s[:, :2] = rng.standard_normal((n, 2)) * 20
        s[:, 2] = rng.random(n) < 0.2
        seqs[i] = s
    from art_sbir_tpu.data.quickdraw import CATEGORIES

    # minimal corpus: the VAE encoder runs 256^2 VGG convs (the raster
    # canvas is fixed at 256), ~14 s/image fwd+bwd on this CPU — keep the
    # e2e step count tiny
    for j, cat in enumerate(CATEGORIES):
        np.savez(d / f"{cat}.npz", train=seqs[2 * j:2 * j + 2],
                 valid=seqs[12 + j:13 + j], test=seqs[18 + j:19 + j])

    from art_sbir_tpu.cli import photo2sketch

    photo2sketch.main(_p2s_args(
        ["--setup", "Quickdraw", "--data_root", str(d)]))
    runs = list((tmp_path / "results").iterdir())
    assert len(runs) == 1
    training = json.loads((runs[0] / "training.json").read_text())
    assert math.isfinite(training["train_losses"]["total_loss"][-1])
    assert (runs[0] / "samples_1.png").is_file()
