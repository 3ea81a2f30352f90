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


def _shape_params(class_id: int, photo_id: int) -> list:
    """Deterministic shape composition for one photo instance.

    Shape 0's type encodes the CLASS (so the classification head has signal);
    the remaining shapes' types/positions/sizes/colors encode the INSTANCE
    (so triplet retrieval has signal). Returned tuples:
    (shape_type, cx, cy, rx, ry, angle, rgb) — all fractions of image size.
    """
    rng = np.random.default_rng(1_000_003 * class_id + photo_id)
    shapes = []
    n_shapes = 2 + int(rng.integers(0, 2))  # 2 or 3 shapes
    # each shape lives in its own quadrant (seeded order) so photos don't
    # occlude shapes the sketch still outlines — occlusion destroys the
    # photo-side instance signal the triplet loss must learn
    quads = rng.permutation(4)[:n_shapes]
    for s in range(n_shapes):
        stype = class_id % 3 if s == 0 else int(rng.integers(0, 3))
        qx, qy = quads[s] % 2, quads[s] // 2
        cx = 0.25 + 0.5 * qx + rng.uniform(-0.08, 0.08)
        cy = 0.25 + 0.5 * qy + rng.uniform(-0.08, 0.08)
        rx = rng.uniform(0.10, 0.20)
        ry = rx * rng.uniform(0.6, 1.0)
        angle = float(rng.uniform(0, 2 * np.pi))
        color = tuple(int(c) for c in rng.integers(40, 216, 3))
        shapes.append((stype, float(cx), float(cy), float(rx), float(ry),
                       angle, color))
    return shapes


def _shape_points(stype, cx, cy, rx, ry, angle, size) -> list:
    """Polygon vertices (pixels) for rect/triangle; None for ellipse."""
    if stype == 0:
        return None  # axis-aligned ellipse
    n = 4 if stype == 1 else 3
    phase = angle
    pts = []
    for k in range(n):
        t = phase + 2 * np.pi * k / n
        pts.append((cx * size + rx * size * np.cos(t),
                    cy * size + ry * size * np.sin(t)))
    return pts


def _learnable_photo(class_id: int, photo_id: int, size: int) -> Image.Image:
    """Photo: outlined, lightly-filled shapes over a bright background.

    Design notes (measured, see PERF.md "learnable corpus"): shapes carry a
    black outline identical to the sketch rendering and the background is
    bright (230 +- gradient), so the two modalities share edge features and
    first/second-moment pixel statistics. With a single shared BatchNorm
    encoder (reference `model.py` semantics), eval-mode retrieval normalizes
    BOTH modalities with one set of running stats — a large photo/sketch
    statistics gap makes eval-mode embeddings diverge from the train-mode
    ones the loss optimized, which caps retrieval at near-chance even when
    train-mode retrieval is ~perfect (the round-2 scale-golden train/test
    loss gap had the same root cause)."""
    rng = np.random.default_rng(7_000_003 * class_id + photo_id + 13)
    base = rng.integers(215, 245)
    grad = np.linspace(-12, 12, size)[:, None]
    arr = np.clip(base + grad + rng.normal(0, 5, (size, size)), 0, 255)
    arr = np.repeat(arr[..., None], 3, -1).astype(np.uint8)
    img = Image.fromarray(arr)
    draw = ImageDraw.Draw(img)
    width = max(1, size // 48)
    for stype, cx, cy, rx, ry, angle, color in _shape_params(class_id, photo_id):
        # muted fill: keep fills light so overall brightness stays close to
        # the sketch domain, but distinct enough to look like a photo
        fill = tuple(int(160 + 0.35 * c) for c in color)
        pts = _shape_points(stype, cx, cy, rx, ry, angle, size)
        if pts is None:
            bbox = [(cx - rx) * size, (cy - ry) * size,
                    (cx + rx) * size, (cy + ry) * size]
            draw.ellipse(bbox, fill=fill, outline=(0, 0, 0), width=width)
        else:
            draw.polygon(pts, fill=fill, outline=(0, 0, 0), width=width)
    return img


def _learnable_sketch(class_id: int, photo_id: int, sketch_id: int,
                      size: int) -> Image.Image:
    """Sketch: black outlines of the SAME shapes on white, with small
    per-sketch hand-drawn jitter (center/size/rotation), so the sketch is a
    deterministic function of its paired photo plus sketch-level noise."""
    rng = np.random.default_rng(
        900_000_007 * class_id + 1_009 * photo_id + sketch_id)
    img = Image.new("RGB", (size, size), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    for stype, cx, cy, rx, ry, angle, _ in _shape_params(class_id, photo_id):
        cx += rng.normal(0, 0.012)
        cy += rng.normal(0, 0.012)
        rx *= rng.uniform(0.92, 1.08)
        ry *= rng.uniform(0.92, 1.08)
        angle += rng.normal(0, 0.05)
        pts = _shape_points(stype, cx, cy, rx, ry, angle, size)
        width = max(1, size // 48)
        if pts is None:
            bbox = [(cx - rx) * size, (cy - ry) * size,
                    (cx + rx) * size, (cy + ry) * size]
            draw.ellipse(bbox, outline=(0, 0, 0), width=width)
        else:
            draw.polygon(pts, outline=(0, 0, 0), width=width)
    return img


def make_synthetic_sketchy(
    root: Path | str,
    n_classes: int = 3,
    photos_per_class: int = 3,
    sketches_per_photo: int = 2,
    size: int = 96,
    with_svg: bool = False,
    learnable: bool = False,
) -> Path:
    """data/sketchy layout: photos/<class>/nX_Y.jpg +
    sketches_png/<class>/nX_Y-k.png (+ sketches_svg).

    ``learnable=False`` (default) keeps the historical corpus — uniform-noise
    photos + unrelated random polyline sketches — whose retrieval metrics sit
    exactly at the random-ranking expectation; existing goldens pin it.
    ``learnable=True`` renders each sketch as a line drawing of its paired
    photo's shape composition (VERDICT round-2 item 1), so triplet training
    (reference `train.py:39-98` recipe) demonstrably moves recall@K above
    chance — see ``tests/test_learnability.py`` and ``goldens/learn_tpu.json``.
    """
    root = Path(root)
    classes = [f"class{c:02d}" for c in range(n_classes)]
    for ci, cls in enumerate(classes):
        (root / "photos" / cls).mkdir(parents=True, exist_ok=True)
        (root / "sketches_png" / cls).mkdir(parents=True, exist_ok=True)
        if with_svg:
            (root / "sketches_svg" / cls).mkdir(parents=True, exist_ok=True)
        for pi in range(photos_per_class):
            img_id = f"n{ci:08d}_{pi}"
            photo = (_learnable_photo(ci, pi, size) if learnable
                     else _img(ci * 100 + pi, size))
            photo.save(root / "photos" / cls / f"{img_id}.jpg")
            for si in range(1, sketches_per_photo + 1):
                sketch = (_learnable_sketch(ci, pi, si, size) if learnable
                          else _img(ci * 1000 + pi * 10 + si, size, sketch=True))
                sketch.save(root / "sketches_png" / cls / f"{img_id}-{si}.png")
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
