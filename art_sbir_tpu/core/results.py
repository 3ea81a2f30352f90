"""Results-directory contract.

Mirrors the reference persistence layout (reference `utils.py:210-254`):
each run writes ``results/<Class>_<dataset>_<YYYY-MM-DD_HH-MM>/`` containing
``data_params.json``, ``training.json``, ``training_params.json`` and
``inference.json``; model checkpoints land next to it under ``models/``.
Checkpoints here are orbax (see :mod:`art_sbir_tpu.core.checkpoint`) instead
of torch state-dicts, but the four-JSON metrics contract is identical so the
reference's downstream tooling (manual A/B of inference.json, plotting) maps
one-to-one.
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, Optional


def _jsonable(obj: Any) -> Any:
    """Best-effort conversion of numpy/jax scalars and arrays for json."""
    if hasattr(obj, "item") and getattr(obj, "ndim", None) == 0:
        return obj.item()
    if hasattr(obj, "tolist"):
        return obj.tolist()
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, Path):
        return str(obj)
    return obj


class ResultsWriter:
    """Creates and fills one ``results/<run_name>`` directory."""

    def __init__(
        self,
        model_class: str,
        dataset: str,
        root: Path | str = Path("results"),
        timestamp: Optional[str] = None,
    ):
        ts = timestamp or datetime.now().strftime("%Y-%m-%d_%H-%M")
        self.run_name = f"{model_class}_{dataset}_{ts}"
        self.path = Path(root) / self.run_name
        self.path.mkdir(parents=True, exist_ok=True)

    def write(self, name: str, payload: Dict[str, Any]) -> Path:
        out = self.path / f"{name}.json"
        out.write_text(json.dumps(_jsonable(payload), indent=4))
        return out

    def write_all(
        self,
        data_params: Dict[str, Any],
        training: Dict[str, Any],
        training_params: Dict[str, Any],
        inference: Dict[str, Any],
    ) -> Path:
        self.write("data_params", data_params)
        self.write("training", training)
        self.write("training_params", training_params)
        self.write("inference", inference)
        return self.path


def load_results(folder: Path | str) -> Dict[str, Dict[str, Any]]:
    folder = Path(folder)
    out = {}
    for name in ("data_params", "training", "training_params", "inference"):
        f = folder / f"{name}.json"
        if f.is_file():
            out[name] = json.loads(f.read_text())
    return out
