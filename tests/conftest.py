"""Test config: run everything on a virtual 8-device CPU mesh so the
data-parallel sharding path is exercised without TPU hardware (SURVEY.md §4).

Must set XLA flags before jax initializes a backend.
"""

import os

# force (the image presets JAX_PLATFORMS=axon -> the real TPU chip)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var set in-process;
# the config route reliably pins the CPU backend (with the 8 virtual
# devices from XLA_FLAGS above).
jax.config.update("jax_platforms", "cpu")

# Default matmul precision is low (~2e-3 relative, bf16 passes); tests
# compare against torch/numpy float32, so pin full-precision matmuls. (TPU
# production paths choose dtype/precision explicitly per kernel.)
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
