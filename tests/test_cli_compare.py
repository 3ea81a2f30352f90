"""Run-comparison CLI over synthesized result folders."""

import json
from pathlib import Path


def _fake_run(root: Path, name: str, mrr: float):
    d = root / name
    d.mkdir(parents=True)
    (d / "inference.json").write_text(json.dumps({
        "mean_reciprocal_rank": mrr,
        "topk_acc": [min(1.0, mrr + 0.05 * k) for k in range(10)],
        "mean": 1.0 / mrr,
    }))
    return name


def test_compare_cli(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from art_sbir_tpu.cli.compare import main

    results = tmp_path / "results"
    a = _fake_run(results, "ModelA_SketchyV1_x", 0.5)
    b = _fake_run(results, "ModelB_SketchyV1_y", 0.25)
    main([a, b, "--results_root", str(results),
          "--out", str(tmp_path / "cmp.png")])
    out = capsys.readouterr().out
    assert "ModelA_SketchyV1_x" in out and "0.5000" in out
    assert "ModelB_SketchyV1_y" in out and "0.2500" in out
    assert (tmp_path / "cmp.png").is_file()


def test_compare_cli_two_pass_shape(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from art_sbir_tpu.cli.compare import main

    d = tmp_path / "results" / "Mixed_run"
    d.mkdir(parents=True)
    (d / "inference_updated.json").write_text(json.dumps({
        "image_features": "x",
        "drawing_stats": {"mean_reciprocal_rank": 0.9,
                          "topk_acc": [0.9] * 10, "mean": 1.1},
        "sketch_stats": {"mean_reciprocal_rank": 0.1,
                         "topk_acc": [0.1] * 10, "mean": 9.0},
    }))
    main(["Mixed_run", "--results_root", str(tmp_path / "results"),
          "--out", str(tmp_path / "cmp2.png")])
    assert (tmp_path / "cmp2.png").is_file()
