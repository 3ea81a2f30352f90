"""Metric tracking, timers, and profiling hooks.

Covers the reference's observability surface (SURVEY.md §5.1/§5.5): loss
accumulation per epoch (reference `utils.py:92-102` `process_losses`),
wall-clock `training_time`/`inference_time`, and — new here — optional
`jax.profiler` trace capture and per-step device timing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List

import jax


class LossTracker:
    """Dict-keyed loss accumulator with 'add' and 'append' modes, mirroring
    the reference ``process_losses`` (reference `utils.py:92-102`)."""

    def __init__(self, keys: List[str]):
        self.sums: Dict[str, float] = {k: 0.0 for k in keys}
        self.series: Dict[str, List[float]] = {k: [] for k in keys}

    def add(self, losses: Dict[str, float], size: int = 1) -> None:
        """Accumulate WITHOUT a host sync: device scalars stay lazy
        (`0.0 + jax scalar` dispatches an add), so per-step tracking does
        not serialize the device pipeline — one RTT per loss key per step
        through the axon tunnel would otherwise dominate small steps.
        ``append``/host reads pay the sync once per logging window."""
        for k in self.sums:
            self.sums[k] = self.sums[k] + losses[k] / size

    def append(self, losses: Dict[str, float], size: int = 1) -> None:
        for k in self.series:
            self.series[k].append(float(losses[k]) / size)

    def reset_sums(self) -> None:
        for k in self.sums:
            self.sums[k] = 0.0


class Timer:
    """Wall-clock timer; `device_sync=True` blocks on outstanding device work
    so timings measure real execution, not async dispatch."""

    def __init__(self, device_sync: bool = False):
        self._sync = device_sync
        self.start = self._now()

    def _now(self) -> float:
        if self._sync:
            (jax.device_put(0) + 0).block_until_ready()
        return time.perf_counter()

    def elapsed(self) -> float:
        return self._now() - self.start

    def restart(self) -> float:
        e = self.elapsed()
        self.start = self._now()
        return e


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None) -> Iterator[None]:
    """Capture a jax.profiler trace when a directory is given."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
