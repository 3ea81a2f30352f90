"""Learning-rate schedules matching the reference scheduler factory
(reference `drawing_utils/networks.py:24-38` `get_scheduler`): linear decay
after ``n_epochs``, step decay, and cosine — as optax schedules usable inside
jitted optimizers (plateau, being metric-reactive, is provided as a host-side
helper)."""

from __future__ import annotations

import math
from typing import Callable

import optax


def linear_decay(lr: float, n_epochs: int, n_epochs_decay: int,
                 steps_per_epoch: int = 1) -> optax.Schedule:
    """Constant for ``n_epochs``, then linear to 0 over ``n_epochs_decay``."""

    def sched(step):
        epoch = step / steps_per_epoch
        frac = (epoch - n_epochs) / max(n_epochs_decay, 1)
        frac = jnp_clip(frac, 0.0, 1.0)
        return lr * (1.0 - frac)

    return sched


def step_decay(lr: float, decay_iters: int, gamma: float = 0.1,
               steps_per_epoch: int = 1) -> optax.Schedule:
    def sched(step):
        epoch = step // steps_per_epoch
        return lr * gamma ** (epoch // decay_iters)

    return sched


def cosine_decay(lr: float, n_epochs: int, steps_per_epoch: int = 1,
                 eta_min: float = 0.0) -> optax.Schedule:
    def sched(step):
        epoch = step / steps_per_epoch
        return eta_min + (lr - eta_min) * 0.5 * (
            1 + jnp_cos(math.pi * jnp_clip(epoch / n_epochs, 0.0, 1.0))
        )

    return sched


class ReduceOnPlateau:
    """Host-side plateau scheduler (torch ReduceLROnPlateau semantics: min
    mode, factor, patience, threshold 1e-2 relative)."""

    def __init__(self, lr: float, factor: float = 0.2, patience: int = 5,
                 threshold: float = 0.01):
        self.lr = lr
        self.factor, self.patience, self.threshold = factor, patience, threshold
        self.best = float("inf")
        self.bad_epochs = 0

    def update(self, metric: float) -> float:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr


def jnp_clip(x, lo, hi):
    import jax.numpy as jnp

    return jnp.clip(x, lo, hi)


def jnp_cos(x):
    import jax.numpy as jnp

    return jnp.cos(x)
