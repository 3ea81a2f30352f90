"""Matplotlib reporting: loss curves, top-k accuracy bars, retrieval grids,
triplet sheets (counterpart of the reference `visualization.py`)."""
