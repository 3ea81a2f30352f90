"""Convenience re-exports of the framework's most used helpers (the
counterpart of the reference's grab-bag `utils.py`, re-homed into proper
layers: losses -> train/, persistence -> core/ + retrieval/, distances ->
ops/)."""

from art_sbir_tpu.core.checkpoint import CheckpointManager, load_pytree, save_pytree
from art_sbir_tpu.core.metrics import LossTracker, Timer
from art_sbir_tpu.core.results import ResultsWriter, load_results
from art_sbir_tpu.ops.distance import cosine_distance, euclidean_distance
from art_sbir_tpu.retrieval.embed import load_image_features, save_image_features
from art_sbir_tpu.train.losses import MARGIN, TripletLossConfig

__all__ = [
    "CheckpointManager", "save_pytree", "load_pytree",
    "LossTracker", "Timer", "ResultsWriter", "load_results",
    "cosine_distance", "euclidean_distance",
    "save_image_features", "load_image_features",
    "MARGIN", "TripletLossConfig",
]
