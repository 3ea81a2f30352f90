"""Unpaired image catalog for the informative-drawings pipeline.

Counterpart of the reference `UnpairedDepthDataset`
(`drawing_utils/dataset.py:43-150`): a recursive image glob capped at 10k
files (`dataset.py:29-41`), optional per-image depth maps, and in train mode
an unpaired second domain sampled independently. Decoding/resizing runs in
the shared loader; depth maps are joined by stem when a depth dir exists.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
MAX_FILES = 10_000


def list_images(root: Path | str, max_files: int = MAX_FILES) -> List[Path]:
    """Sorted recursive glob capped at ``max_files`` (reference
    `dataset.py:29-41`)."""
    root = Path(root)
    out: List[Path] = []
    for p in sorted(root.rglob("*")):
        if p.suffix.lower() in _EXTS and p.is_file():
            out.append(p)
            if len(out) >= max_files:
                break
    return out


class UnpairedImageCatalog:
    name = "UnpairedDepthDataset"

    def __init__(
        self,
        root: Path | str,
        root2: Optional[Path | str] = None,
        depth_root: Optional[Path | str] = None,
        mode: str = "train",
        seed: int = 42,
    ):
        import random

        self.mode = mode
        self.rng = random.Random(seed)
        self.paths = list_images(root)
        self.paths2 = list_images(root2) if root2 else []
        self.depth: Dict[str, Path] = {}
        if depth_root:
            self.depth = {p.stem: p for p in list_images(depth_root)}

    def __len__(self) -> int:
        return len(self.paths)

    def item(self, idx: int) -> Dict:
        out: Dict = {"image": self.paths[idx], "name": self.paths[idx].stem}
        if self.mode == "train" and self.paths2:
            out["image2"] = self.paths2[self.rng.randrange(len(self.paths2))]
        d = self.depth.get(self.paths[idx].stem)
        if d is not None:
            out["depth"] = d
        return out

    @property
    def state_dict(self) -> Dict:
        return {
            "dataset": self.name,
            "img_number": len(self),
            "mode": self.mode,
            "second_domain": bool(self.paths2),
            "with_depth": bool(self.depth),
        }
