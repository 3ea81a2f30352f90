"""Dataset layer: path/index catalogs with the reference's exact pairing and
split semantics, host-side loaders feeding fixed-shape device batches, and a
synthetic data generator for tests and demos.

Design split (vs the reference's torch Dataset classes,
`data_preparation.py`): *catalogs* are cheap, picklable path/label tables
(pure python/numpy — no tensor work); *loaders* decode and batch on the
host; all image math (resize, normalize, augment, rasterize) runs on device
inside the jitted step. Triplet negative sampling is index arithmetic in the
loader, preserving the reference's distributions (uniform negatives for V1,
same-class for V2).
"""

from art_sbir_tpu.data.catalog import get_datasets, DATASETS

# importing the dataset modules populates the DATASETS registry
from art_sbir_tpu.data import kaggle as _kaggle  # noqa: F401,E402
from art_sbir_tpu.data import mixed as _mixed  # noqa: F401,E402
from art_sbir_tpu.data import quickdraw as _quickdraw  # noqa: F401,E402
from art_sbir_tpu.data import sketchy as _sketchy  # noqa: F401,E402
from art_sbir_tpu.data import unpaired as _unpaired  # noqa: F401,E402
from art_sbir_tpu.data import vector_sketchy as _vector_sketchy  # noqa: F401,E402

__all__ = ["get_datasets", "DATASETS"]
