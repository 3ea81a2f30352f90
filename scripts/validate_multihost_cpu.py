"""Multi-host validation without a TPU pod: launch N real OS processes on
this machine, wire them into one JAX runtime over a localhost coordinator
(`art_sbir_tpu.parallel.multihost.initialize` via the JAX_COORDINATOR_*
env contract), build the global data mesh over every process's virtual CPU
devices, and run a sharded gradient step whose all-reduce crosses process
boundaries — the same collective path a TPU pod takes over DCN.

Each worker checks the cross-process gradient and loss against the
locally-computed single-process value (the batch is seeded identically
everywhere, so the global result is exactly reproducible per process) and
prints MULTIHOST_OK. The parent asserts every worker succeeded.

Usage: python scripts/validate_multihost_cpu.py [n_processes] [devices_per]
Also run by tests/test_multihost_process.py (slow).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def worker() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from art_sbir_tpu.parallel import multihost, shard_batch

    multihost.initialize()
    pc, pid = jax.process_count(), jax.process_index()
    assert pc == int(os.environ["JAX_NUM_PROCESSES"]), (pc, os.environ)
    mesh = multihost.global_data_mesh()
    n_global = mesh.devices.size

    # every process builds the SAME seeded global batch, slices its rows,
    # and assembles the globally-sharded array (the cli/train.py pattern)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 8)).astype(np.float32)
    y = rng.standard_normal((16,)).astype(np.float32)
    w = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

    local = multihost.local_batch_slice({"x": x, "y": y})
    gbatch = multihost.global_batch(mesh, local)

    def loss_fn(w, batch):
        pred = batch["x"] @ w
        return jnp.mean((pred - batch["y"]) ** 2)

    from jax.sharding import NamedSharding, PartitionSpec

    step = jax.jit(jax.value_and_grad(loss_fn),
                   out_shardings=(NamedSharding(mesh, PartitionSpec()),) * 2)
    loss, grad = step(w, gbatch)  # all-reduce spans all processes
    # replicated outputs: every process holds a full addressable copy
    loss = np.asarray(loss.addressable_shards[0].data)
    grad = np.asarray(grad.addressable_shards[0].data)

    # single-process truth computed locally from the full batch
    ref_loss, ref_grad = jax.value_and_grad(loss_fn)(
        w, {"x": jnp.asarray(x), "y": jnp.asarray(y)})
    np.testing.assert_allclose(loss, np.asarray(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(grad, np.asarray(ref_grad), rtol=1e-5)

    # shard_batch places this process's addressable rows of the global batch
    sb = shard_batch(mesh, {"x": x})
    rows = np.concatenate([
        np.asarray(sh.data)
        for sh in sorted(sb["x"].addressable_shards,
                         key=lambda s: s.index[0].start or 0)
    ])
    np.testing.assert_array_equal(rows, x[multihost.process_shard(len(x))])

    print(f"MULTIHOST_OK process {pid}/{pc} devices={n_global} "
          f"loss={float(loss):.6f}", flush=True)


def launch(n_processes: int = 2, devices_per: int = 4) -> None:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(n_processes):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices_per}",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": str(n_processes),
            "JAX_PROCESS_ID": str(pid),
            "PYTHONPATH": str(REPO) + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--worker"], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    ok = True
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or "MULTIHOST_OK" not in out:
            ok = False
            print(f"--- worker {pid} FAILED (rc={p.returncode}) ---\n{out}")
        else:
            print(next(l for l in out.splitlines() if "MULTIHOST_OK" in l))
    if not ok:
        raise SystemExit(1)
    print(f"multihost validation passed: {n_processes} processes x "
          f"{devices_per} devices")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
        d = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        launch(n, d)
