"""Core utilities: typed configs and registries, PRNG discipline, orbax
checkpointing, the results-directory contract, and metric tracking."""

from art_sbir_tpu.core.config import Registry
from art_sbir_tpu.core.prng import RngStream
from art_sbir_tpu.core.results import ResultsWriter

__all__ = ["Registry", "RngStream", "ResultsWriter"]
