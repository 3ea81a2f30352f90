"""Data acquisition CLI (reference `data_setup.py`).

Downloads + unpacks the Sketchy photos/sketches/SVG archives into
``data/sketchy/`` and builds the Kaggle train/test CSV splits (reference
`data_setup.py:17-82`, `data/kaggle/kaggle_info.py:43-48`). Also provides
``--synthetic`` to generate the miniature test corpora used by CI and smoke
runs (no network needed).
"""

from __future__ import annotations

import argparse
import shutil
import urllib.request
import zipfile
from pathlib import Path

SKETCHY_URLS = {
    # the public Sketchy database mirrors used by the reference
    "photos": "https://sketchy.eye.gatech.edu/rendered_256x256.7z",
    "sketches": "https://sketchy.eye.gatech.edu/sketches_png.zip",
    "svgs": "https://sketchy.eye.gatech.edu/sketches_svg.zip",
}


def download(url: str, dest: Path) -> Path:
    dest.parent.mkdir(parents=True, exist_ok=True)
    if dest.exists():
        print(f"{dest} already present", flush=True)
        return dest
    print(f"downloading {url} -> {dest}", flush=True)
    with urllib.request.urlopen(url) as r, open(dest, "wb") as f:
        shutil.copyfileobj(r, f)
    return dest


def unpack(archive: Path, dest: Path) -> None:
    dest.mkdir(parents=True, exist_ok=True)
    if archive.suffix == ".zip":
        with zipfile.ZipFile(archive) as z:
            z.extractall(dest)
    else:
        raise RuntimeError(
            f"cannot unpack {archive} here — extract manually into {dest}"
        )


def build_kaggle_split(
    kaggle_dir: Path, test_size: int = 6000, seed: int = 2,
    min_count: int = 100,
) -> None:
    """Build kaggle_art_dataset_{train,test}.csv from an all-data CSV with
    filename/style/genre columns — the reference recipe
    (`data/kaggle/kaggle_info.py`): drop genres and styles with fewer than
    100 images, then train_test_split(test_size=6000, random_state=2)."""
    import numpy as np
    import pandas as pd

    src = kaggle_dir / "all_data_info.csv"
    if not src.is_file():
        raise FileNotFoundError(f"expected {src} (Kaggle painter-by-numbers info)")
    df = pd.read_csv(src)
    cols = {"new_filename": "filename"} if "new_filename" in df.columns else {}
    df = df.rename(columns=cols)[["filename", "style", "genre"]].dropna()

    for col in ("genre", "style"):
        counts = df.groupby(col)["filename"].count()
        df = df[df[col].isin(counts[counts >= min_count].index)]

    rng = np.random.RandomState(seed)
    perm = rng.permutation(len(df))
    n_test = min(test_size, len(df) // 10)
    test = df.iloc[perm[:n_test]].reset_index(drop=True)
    train = df.iloc[perm[n_test:]]
    train.to_csv(kaggle_dir / "kaggle_art_dataset_train.csv", index=False)
    test.to_csv(kaggle_dir / "kaggle_art_dataset_test.csv", index=False)
    print("kaggle CSV splits written", flush=True)


def copy_test_images(kaggle_dir: Path, source_dir: Path) -> None:
    """Copy the test split's images into data/kaggle/photos/test
    (reference `get_kaggle_test.py`)."""
    import csv
    import shutil

    dest = kaggle_dir / "photos" / "test"
    dest.mkdir(parents=True, exist_ok=True)
    with open(kaggle_dir / "kaggle_art_dataset_test.csv", newline="") as f:
        for row in csv.DictReader(f):
            shutil.copy(source_dir / row["filename"], dest / row["filename"])
    print(f"test images copied to {dest}", flush=True)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="dataset download / preparation")
    p.add_argument("--sketchy_download", action="store_true")
    p.add_argument("--kaggle_split", action="store_true")
    p.add_argument("--kaggle_copy_test", type=str, default=None,
                   help="source image dir; copies the test split's images "
                        "(reference get_kaggle_test.py)")
    p.add_argument("--synthetic", action="store_true",
                   help="generate miniature synthetic corpora for smoke runs")
    p.add_argument("--learnable", action="store_true",
                   help="with --synthetic: render sketches as line drawings "
                        "of their paired photos (retrieval is learnable) "
                        "instead of unrelated noise")
    p.add_argument("--root", type=str, default="data")
    args = p.parse_args(argv)
    if args.learnable and not args.synthetic:
        p.error("--learnable only applies to --synthetic corpora")

    root = Path(args.root)
    if args.synthetic:
        from art_sbir_tpu.data.synthetic import (
            make_synthetic_kaggle,
            make_synthetic_sketchy,
        )

        make_synthetic_sketchy(root / "sketchy", with_svg=True,
                               learnable=args.learnable)
        make_synthetic_kaggle(root / "kaggle")
        print(f"synthetic corpora written under {root}", flush=True)
        return

    if args.sketchy_download:
        sk = root / "sketchy"
        for name, url in SKETCHY_URLS.items():
            try:
                archive = download(url, sk / Path(url).name)
                if archive.suffix == ".zip":
                    unpack(archive, sk)
            except Exception as e:
                print(f"{name}: download failed ({e}); fetch manually from "
                      f"{url} into {sk}", flush=True)
    if args.kaggle_split:
        build_kaggle_split(root / "kaggle")
    if args.kaggle_copy_test:
        copy_test_images(root / "kaggle", Path(args.kaggle_copy_test))


if __name__ == "__main__":
    main()
