"""True multi-process multihost validation (TODO item 6): two OS processes
join one JAX runtime over a localhost coordinator and a cross-process
gradient all-reduce must equal the single-process computation exactly.
Covers `parallel/multihost.py`'s env contract + `jax.distributed` wiring +
the global-mesh collective path a TPU pod uses over DCN (Gloo here).
"""

import subprocess
import sys
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / "validate_multihost_cpu.py"


@pytest.mark.slow
def test_two_process_allreduce_matches_single_process():
    out = subprocess.run(
        [sys.executable, str(SCRIPT), "2", "4"],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert out.stdout.count("MULTIHOST_OK") == 2, out.stdout
    assert "multihost validation passed" in out.stdout
