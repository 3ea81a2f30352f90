"""Tensor-parallel (2-D mesh) sharding for the encoder zoo.

The reference is single-process, single-GPU (SURVEY.md §2.9 — its
``DataParallel`` is commented out), so data parallelism over ICI already
reproduces its complete parallelism inventory. This module goes BEYOND the
reference with a GSPMD tensor-parallel option: parameters are
channel-sharded over a second ``model`` mesh axis, so one forward's weight
memory and matmul/conv FLOPs split across chips. There are no hand-written
collectives anywhere — weights carry :class:`NamedSharding` annotations and
XLA's SPMD partitioner inserts the all-gathers / reduce-scatters and picks
their schedule over ICI.

Sharding rule (uniform, propagation-friendly)
---------------------------------------------
Every parameter whose TRAILING dim is divisible by the model-axis size is
sharded on that trailing dim; everything else (scalars, tiny heads,
odd-sized leaves) is replicated. For the NHWC convnets in this zoo the
trailing dim is always the output-channel dim:

* ``nn.Conv`` kernels ``(kh, kw, cin, cout)`` -> column-parallel convs;
  activations come out channel-sharded,
* ``nn.BatchNorm`` scale/bias and running mean/var ``(C,)`` -> BN is
  perfectly parallel per channel shard (BN reduces over batch/space, never
  across channels),
* ``nn.Dense`` kernels ``(in, out)`` and biases -> column-parallel heads,
* the attention pool's positional embedding ``(HW+1, D)`` -> sharded on D,
  matching the channel-sharded tokens it is added to.

GSPMD resolves each next contraction (whose input operand is now sharded
on the contracting dim) by all-gathering whichever operand its cost model
prices cheaper — for convnets that is the kernel, a few MB, riding ICI.

The same rule applied to a whole :class:`TrainState` pytree shards Adam's
``mu``/``nu`` moments identically to their parameters (they are
shape-congruent leaves), keeps ``step``/``count`` scalars replicated, and
channel-shards the ``batch_stats`` collection — i.e. optimizer state and
BN statistics are tensor-parallel too, nothing is replicated that scales
with model width.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from art_sbir_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"


def mesh_2d(
    n_data: int,
    n_model: int,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """A ``(data, model)`` 2-D mesh over the first ``n_data * n_model``
    devices. On real hardware the model axis should map to the
    fastest-ICI-connected neighbours; device order from ``jax.devices()``
    already reflects the platform's torus ordering."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(
            f"mesh_2d wants {n_data}x{n_model}={need} devices, "
            f"only {len(devices)} present")
    dev = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=tuple(axis_names))


def tp_spec(leaf: Any, n_model: int, model_axis: str = MODEL_AXIS) -> P:
    """The uniform trailing-dim rule (see module docstring)."""
    shape = getattr(leaf, "shape", None)
    if not shape or shape[-1] % n_model:
        return P()
    return P(*([None] * (len(shape) - 1)), model_axis)


def tp_shard_tree(
    mesh: Mesh, tree: Any, model_axis: str = MODEL_AXIS
) -> Any:
    """Same-structure tree of :class:`NamedSharding` for ``tree``'s leaves
    under the trailing-dim rule."""
    n_model = int(mesh.shape[model_axis])
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, tp_spec(leaf, n_model, model_axis)),
        tree,
    )


def tp_place(mesh: Mesh, tree: Any, model_axis: str = MODEL_AXIS) -> Any:
    """Device-put ``tree`` (params / batch_stats / a whole TrainState)
    with its leaves channel-sharded over the model axis."""
    return jax.device_put(tree, tp_shard_tree(mesh, tree, model_axis))
