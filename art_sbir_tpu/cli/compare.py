"""Compare retrieval results across saved runs (reference
`visualization.py:157-194` `show_compared_topk_accuracy` + the manual-A/B
workflow over `results/<run>/inference*.json`).

Usage: ``python -m art_sbir_tpu.cli.compare run_folder1 run_folder2 ...``
Writes a grouped top-k bar chart + a metric table to stdout.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict


def _load_inference(folder: Path) -> Dict:
    for name in ("inference_updated.json", "inference.json"):
        f = folder / name
        if f.is_file():
            d = json.loads(f.read_text())
            # kaggle/mixed two-pass shape -> use the drawing stats
            return d.get("drawing_stats", d)
    raise FileNotFoundError(f"no inference json in {folder}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="compare saved retrieval runs")
    p.add_argument("folders", nargs="+")
    p.add_argument("--results_root", type=str, default="results")
    p.add_argument("--out", type=str, default="comparison_topk.png")
    args = p.parse_args(argv)

    from art_sbir_tpu.viz.plots import compared_topk_bars

    root = Path(args.results_root)
    results = {}
    rows = []
    for name in args.folders:
        folder = root / name if (root / name).is_dir() else Path(name)
        stats = _load_inference(folder)
        results[folder.name] = stats["topk_acc"]
        rows.append(
            (folder.name, stats.get("mean_reciprocal_rank", float("nan")),
             stats["topk_acc"][0], stats["topk_acc"][-1],
             stats.get("mean", float("nan")))
        )

    out = compared_topk_bars(results, Path(args.out))
    header = f"{'run':60s} {'MRR':>8s} {'top1':>7s} {'top10':>7s} {'mean rank':>10s}"
    print(header, flush=True)
    for name, mrr, t1, t10, mean_rank in rows:
        print(f"{name:60s} {mrr:8.4f} {t1:7.3f} {t10:7.3f} {mean_rank:10.1f}",
              flush=True)
    print(f"chart written to {out}", flush=True)


if __name__ == "__main__":
    main()
