"""Synthetic on-disk datasets mirroring the Sketchy and Kaggle layouts.

Used by tests, CLI smoke runs, and benchmarks — the real corpora are
multi-GB downloads (reference `data_setup.py`), so golden-value tests run on
deterministic miniatures with the exact directory/CSV contracts the
catalogs expect.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import List

import numpy as np
from PIL import Image, ImageDraw

STYLES = ["Baroque", "Cubism", "Impressionism"]
GENRES = ["abstract", "landscape", "miniature", "portrait"]


def _img(seed: int, size: int = 96, sketch: bool = False) -> Image.Image:
    rng = np.random.default_rng(seed)
    if sketch:
        img = Image.new("RGB", (size, size), (255, 255, 255))
        draw = ImageDraw.Draw(img)
        pts = rng.integers(5, size - 5, size=(6, 2))
        draw.line([tuple(p) for p in pts], fill=(0, 0, 0), width=2)
    else:
        arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
        img = Image.fromarray(arr)
    return img


def _svg(seed: int, w: int = 640, h: int = 480) -> str:
    """Sketchy-style SVG: each stroke its own <path>, one leading moveto
    then line and cubic-bezier segments (stroke #000)."""
    rng = np.random.default_rng(seed)
    parts = []
    for p in range(int(rng.integers(2, 5))):
        x, y = float(rng.integers(50, 400)), float(rng.integers(50, 400))
        d = f"m{x},{y}"
        for _ in range(int(rng.integers(6, 14))):
            if rng.random() < 0.4:  # cubic bezier, relative control points
                c = rng.normal(0, 12, 6).round(2)
                d += f"c{c[0]},{c[1]} {c[2]},{c[3]} {c[4]},{c[5]}"
            else:
                dx, dy = rng.normal(0, 18, 2).round(2)
                d += f"l{dx},{dy}"
        parts.append(
            f'<path d="{d}" id="p{seed}_{p}" stroke-width="2" stroke="#000" fill="none"/>'
        )
    return (
        f'<svg width="{w}" height="{h}" xmlns="http://www.w3.org/2000/svg">\n'
        + "\n".join(parts)
        + "\n</svg>\n"
    )


def make_synthetic_sketchy(
    root: Path | str,
    n_classes: int = 3,
    photos_per_class: int = 3,
    sketches_per_photo: int = 2,
    size: int = 96,
    with_svg: bool = False,
) -> Path:
    """data/sketchy layout: photos/<class>/nX_Y.jpg +
    sketches_png/<class>/nX_Y-k.png (+ sketches_svg)."""
    root = Path(root)
    classes = [f"class{c:02d}" for c in range(n_classes)]
    for ci, cls in enumerate(classes):
        (root / "photos" / cls).mkdir(parents=True, exist_ok=True)
        (root / "sketches_png" / cls).mkdir(parents=True, exist_ok=True)
        if with_svg:
            (root / "sketches_svg" / cls).mkdir(parents=True, exist_ok=True)
        for pi in range(photos_per_class):
            img_id = f"n{ci:08d}_{pi}"
            _img(ci * 100 + pi, size).save(root / "photos" / cls / f"{img_id}.jpg")
            for si in range(1, sketches_per_photo + 1):
                _img(ci * 1000 + pi * 10 + si, size, sketch=True).save(
                    root / "sketches_png" / cls / f"{img_id}-{si}.png"
                )
                if with_svg:
                    (root / "sketches_svg" / cls / f"{img_id}-{si}.svg").write_text(
                        _svg(ci * 1000 + pi * 10 + si)
                    )
    return root


def make_synthetic_kaggle(
    root: Path | str,
    n_train: int = 12,
    n_test: int = 6,
    size: int = 96,
    sketch_types: List[str] = ("contour_drawings",),
) -> Path:
    """data/kaggle layout: images/ + <sketch_type>/ + the two CSVs +
    categorized_sketches.csv + sketches/ (human queries)."""
    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    for st in sketch_types:
        (root / st).mkdir(parents=True, exist_ok=True)
    (root / "sketches").mkdir(parents=True, exist_ok=True)

    def write_split(mode: str, n: int, offset: int):
        rows = []
        genres = GENRES if mode == "train" else [g for g in GENRES if g != "miniature"]
        for i in range(n):
            fid = offset + i
            fname = f"{fid}.jpg"
            _img(fid, size).save(root / "images" / fname)
            for st in sketch_types:
                _img(fid + 5000, size, sketch=True).save(root / st / f"{fid}.png")
            rows.append(
                {
                    "filename": fname,
                    "style": STYLES[i % len(STYLES)],
                    "genre": genres[i % len(genres)],
                }
            )
        with open(root / f"kaggle_art_dataset_{mode}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["filename", "style", "genre"])
            w.writeheader()
            w.writerows(rows)
        return rows

    write_split("train", n_train, 0)
    test_rows = write_split("test", n_test, 1000)

    # human query sketches referencing test image ids
    with open(root / "categorized_sketches.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["sketch", "valid", "category"])
        w.writeheader()
        for i, r in enumerate(test_rows):
            stem = Path(r["filename"]).stem
            sname = f"{i}-{stem}-{i * 37 % 97}.png"
            _img(9000 + i, size, sketch=True).save(root / "sketches" / sname)
            w.writerow({"sketch": sname, "valid": 1, "category": r["genre"]})
    return root
