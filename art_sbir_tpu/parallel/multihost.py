"""Multi-host (TPU pod / DCN) data parallelism.

The reference's cluster story is embarrassingly parallel SLURM jobs on one
GPU each (reference `sbatch_train.sh:1-8` — `#SBATCH --ntasks=1 -G 1`); it
has no distributed training at all (SURVEY.md §2.9). The TPU-native
extension is standard JAX multi-controller SPMD:

* every host runs the SAME program (`scripts/launch_pod.sh` mirrors the
  reference's sbatch wrapper for TPU pods);
* :func:`initialize` wires the hosts into one JAX runtime
  (``jax.distributed.initialize`` — coordinator/process env auto-detected
  on TPU VMs, explicit args elsewhere);
* the global 1-D ``data`` mesh then spans all chips of all hosts; gradient
  all-reduce rides ICI within a slice and DCN across slices, inserted by
  XLA from the same ``NamedSharding`` annotations the single-host path
  uses (`parallel/mesh.py`);
* each host feeds only its local shard of every global batch
  (:func:`local_batch_slice` + :func:`global_batch`), assembled into a
  globally-sharded array with ``jax.make_array_from_process_local_data``.

Everything degrades to a no-op on one process, so the single-chip bench
path, the 8-virtual-device CPU tests, and a pod run share all code.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

from art_sbir_tpu.parallel.mesh import DATA_AXIS, MeshSpec, batch_sharding


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join this process into a multi-host JAX runtime.

    On TPU VMs all arguments are auto-detected from the metadata server /
    environment; pass them explicitly for CPU/GPU clusters. Call ONCE,
    before any other JAX API touches a backend (this function itself avoids
    backend-initializing calls until it decides to join). No-op when the
    distributed runtime is already up or when running single-process with
    no multi-worker environment configured (a single-entry
    ``TPU_WORKER_HOSTNAMES`` — e.g. ``localhost`` on one-chip VMs — counts
    as single-process).
    """
    if jax.distributed.is_initialized():
        return
    explicit = any(
        a is not None for a in (coordinator_address, num_processes, process_id)
    )
    if not explicit:
        import os

        # explicit env contract for non-TPU clusters (mirrors what
        # scripts/validate_multihost_cpu.py and generic launchers set);
        # TPU pods auto-detect inside jax.distributed.initialize
        env_addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if env_addr:
            coordinator_address = env_addr
            if os.environ.get("JAX_NUM_PROCESSES"):
                num_processes = int(os.environ["JAX_NUM_PROCESSES"])
            if os.environ.get("JAX_PROCESS_ID"):
                process_id = int(os.environ["JAX_PROCESS_ID"])
        else:
            hosts = [
                h for h in
                os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h
            ]
            if len(hosts) <= 1:
                return  # nothing multi-worker configured -> single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_data_mesh(axis_name: str = DATA_AXIS) -> jax.sharding.Mesh:
    """1-D data mesh over ALL devices of ALL processes."""
    return MeshSpec(data=len(jax.devices()), axis_name=axis_name).build()


def process_shard(n: int) -> slice:
    """This host's contiguous slice of a length-``n`` global batch.

    ``n`` must divide evenly by process_count (pad or drop the tail first;
    `cli/train.py` tiles ragged tails before sharding)."""
    pc, pid = jax.process_count(), jax.process_index()
    if n % pc:
        raise ValueError(f"global batch {n} not divisible by {pc} processes")
    per = n // pc
    return slice(pid * per, (pid + 1) * per)


def local_batch_slice(batch: Any) -> Any:
    """Slice a host-replicated global batch pytree down to this host's rows
    (the loader on every host iterates the SAME seeded order, so slicing by
    process index partitions the global batch without coordination)."""
    sl = None

    def _cut(x):
        nonlocal sl
        x = np.asarray(x)
        if sl is None:
            sl = process_shard(len(x))
        return x[sl]

    return jax.tree_util.tree_map(_cut, batch)


def global_batch(mesh: jax.sharding.Mesh, local: Any,
                 axis_name: str = DATA_AXIS) -> Any:
    """Assemble per-host local rows into one globally dim-0-sharded array
    pytree. Works single-process too (== shard_batch)."""

    def _make(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh, x.ndim, axis_name), x, global_shape
        )

    return jax.tree_util.tree_map(_make, local)
