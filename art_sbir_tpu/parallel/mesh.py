"""Mesh construction and sharding specs for the data-parallel training path
and the sharded retrieval gallery.

Design notes
------------
The workload has exactly two distributed axes of interest (SURVEY.md §2.9):

* ``data``: the batch axis of encoder training and gallery embedding. Inputs
  are sharded along ``data``; parameters and optimizer state are replicated.
  With ``jax.jit`` + ``NamedSharding`` XLA performs the gradient all-reduce
  over ICI automatically — no hand-written collectives.
* the retrieval gallery: the (N, D) embedding matrix can be sharded row-wise
  across the same axis. Each chip ranks its shard and the (Q, k) partial
  top-k results are merged; XLA inserts the all-gather of the tiny partials.

BatchNorm under data parallelism (SURVEY.md §7 "hard parts"): the choice
here is GLOBAL-batch statistics ("sync BN"). Because the batch is sharded
with ``NamedSharding`` and the train step runs under plain ``jax.jit``,
GSPMD computes BN's mean/var over the FULL logical batch (inserting the
cross-replica all-reduce itself) — so an N-device run is numerically the
same program as a single-device run on the same global batch, which
``tests/test_sharding.py::test_train_cli_dp_matches_single_device``
asserts to near-bitwise tolerance. This differs from torch's default
per-device BN but matches the reference's *semantics* (it only ever ran
single-device, where per-device == global).

Everything here also runs on a single device (mesh of size 1) so the
single-chip v5e benchmark path and the multi-chip path share all code.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh description.

    ``data`` is the number of data-parallel shards; ``axis_name`` the mesh
    axis used for batch sharding and gradient reduction.
    """

    data: int = 1
    axis_name: str = DATA_AXIS

    def build(self, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
        devices = list(devices if devices is not None else jax.devices())
        if self.data > len(devices):
            raise ValueError(
                f"MeshSpec wants {self.data} devices, only {len(devices)} present"
            )
        dev = np.asarray(devices[: self.data])
        return Mesh(dev, axis_names=(self.axis_name,))


def data_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    return MeshSpec(data=n, axis_name=axis_name).build(devices)


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    spec = P(axis_name, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def gallery_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Row-shard an (N, D) gallery-embedding matrix over the data axis."""
    return NamedSharding(mesh, P(axis_name, None))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = DATA_AXIS) -> Any:
    """Device-put a pytree of arrays with dim-0 sharded over the mesh.

    Host numpy arrays upload directly into the sharded layout; arrays
    already on device reshard device-side (``jax.device_put`` to the new
    sharding) — no host roundtrip."""

    def _put(x):
        if not hasattr(x, "ndim"):
            x = np.asarray(x)
        sh = (replicated(mesh) if x.ndim == 0  # scalars can't dim-0-shard
              else batch_sharding(mesh, x.ndim, axis_name))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(_put, batch)


def shard_or_replicate(mesh: Optional[Mesh], batch: dict,
                       axis_name: str = DATA_AXIS) -> dict:
    """Dim-0-shard a dict batch over the data mesh; a ragged batch (dim 0
    not divisible by the DATA-axis size — a 2-D TP mesh replicates over
    'model') falls back to fully-replicated placement, which stays exact —
    each chip redundantly computes the whole batch. Scalar (0-d) leaves
    are always replicable and never count as ragged. No-op without a
    mesh. Shared by the GAN/VAE trainers."""
    if mesh is None:
        return batch
    n = int(mesh.shape[axis_name])
    if any(getattr(v, "ndim", 0) and v.shape[0] % n
           for v in batch.values() if hasattr(v, "shape")):
        return jax.device_put(batch, replicated(mesh))
    return shard_batch(mesh, batch, axis_name)


def mesh_from_args(n_devices: int, tp_devices: int = 1,
                   multihost: bool = False):
    """Shared CLI mesh construction -> (mesh | None, tp: bool).

    ``n_devices``: data-parallel shards (1/0 = single device, -1 = all
    available — with TP, all available divided by ``tp_devices``).
    ``tp_devices`` > 1 builds a 2-D (data, model) mesh for
    channel-sharded params (:mod:`art_sbir_tpu.parallel.tensor`);
    single-host only."""
    if tp_devices > 1:
        from art_sbir_tpu.parallel.tensor import mesh_2d

        if multihost:
            raise SystemExit(
                "--tp_devices is single-host (combine with --n_devices "
                "for in-host data parallelism)")
        n_data = (max(len(jax.devices()) // tp_devices, 1)
                  if n_devices < 0 else max(n_devices, 1))
        mesh = mesh_2d(n_data, tp_devices)
        print(f"mesh: {n_data} data x {tp_devices} model devices "
              "(params/opt-state/BN stats channel-sharded)", flush=True)
        return mesh, True
    if n_devices > 1 or n_devices < 0:
        mesh = data_mesh(None if n_devices < 0 else n_devices)
        print(f"data mesh: {mesh.devices.size} devices", flush=True)
        return mesh, False
    return None, False


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n``."""
    return ((n + m - 1) // m) * m
