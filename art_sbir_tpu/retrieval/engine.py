"""High-level retrieval evaluation: the reference ``run_inference`` contract
(reference `inference.py:140-165`) on the batched TPU engine.

Flow: embed the dedup-sorted gallery once (or load the feature cache),
embed all query sketches batched, rank + metrics in one device program.
Kaggle/Mixed datasets get the second evaluation pass with the human
sketchit queries against the same gallery (`inference.py:156-165`),
returning ``{'image_features', 'drawing_stats', 'sketch_stats'}``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np

from art_sbir_tpu.core.metrics import Timer
from art_sbir_tpu.data.catalog import InferenceCatalog
from art_sbir_tpu.data.loader import GalleryLoader
from art_sbir_tpu.retrieval.embed import (
    embed_batched,
    load_image_features,
    save_image_features,
)
from art_sbir_tpu.retrieval.rank import evaluate_retrieval


def run_inference(
    forward_fn: Callable,
    dataset,
    feature_folder: Optional[str] = None,
    loss_type: str = "euclidean",
    image_size: int = 224,
    resize_mode: Optional[str] = None,
    batch_size: int = 256,
    mesh=None,
    model_name: str = "ModifiedResNet",
    feature_root: Path | str = Path("data/image_features"),
    kaggle_queries=None,
    save_features: bool = True,
    jit_forward: bool = True,
    query_forward_fn: Optional[Callable] = None,
) -> Dict:
    """``forward_fn`` maps a uint8 (B, S, S, 3) device batch to (B, D)
    embeddings (preprocessing fused inside). ``dataset`` is a test catalog
    with ``sketch_paths`` / ``photo_paths`` / ``state_dict``.

    ``query_forward_fn`` (default: ``forward_fn``) embeds the SKETCH
    queries — per-modality BN recalibration passes an encoder with
    sketch-population running stats here while the gallery uses
    photo-population stats (``train.bn``; VERDICT r3 item 5).

    ``resize_mode=None`` resolves the catalog family's reference-parity
    geometry (the reference embeds gallery AND queries — including the
    sketchit second pass — with the calling dataset's transform,
    `inference.py:74,148,158`)."""
    timer = Timer()
    resize_mode = resize_mode or getattr(dataset, "resize_mode", "square")

    if feature_folder:
        image_paths, gallery = load_image_features(feature_folder, feature_root)
        feature_name = feature_folder
    else:
        inference_catalog = InferenceCatalog(dataset.photo_paths)
        image_paths = inference_catalog.image_paths
        loader = GalleryLoader(image_paths, image_size, resize_mode)
        # device-resident: retrieval consumes the matrix in HBM; only the
        # feature cache needs a host copy
        gallery = embed_batched(forward_fn, loader, len(loader), batch_size,
                                mesh=mesh, return_device=True,
                                jit_apply=jit_forward)
        # save_features=False for transient evals (e.g. the per-epoch
        # retrieval hook) that would otherwise litter feature_root with a
        # timestamped folder per call
        feature_name = save_image_features(
            model_name, dataset.state_dict["dataset"], image_paths,
            np.asarray(gallery, np.float32), root=feature_root,
        ) if save_features else None

    query_fn = query_forward_fn if query_forward_fn is not None else forward_fn

    def _eval(catalog) -> Dict:
        qloader = GalleryLoader(catalog.sketch_paths, image_size, resize_mode)
        queries = embed_batched(query_fn, qloader, len(qloader), batch_size,
                                mesh=mesh, return_device=True,
                                jit_apply=jit_forward)
        return evaluate_retrieval(
            queries, gallery, catalog.sketch_paths,
            image_paths, loss_type=loss_type, start_time=timer.elapsed(),
            mesh=mesh,
        )

    stats = _eval(dataset)

    name = dataset.state_dict["dataset"]
    if ("Kaggle" in name or "Mixed" in name) and kaggle_queries is not None:
        stats2 = _eval(kaggle_queries)
        return {
            "image_features": feature_name,
            "drawing_stats": stats,
            "sketch_stats": stats2,
        }
    stats["image_features"] = feature_name
    return stats
