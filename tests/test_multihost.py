"""Real multi-process data parallelism: two jax.distributed processes
(4 virtual CPU devices each, gloo collectives) must reproduce the
single-process 8-device sharded training step — worker-vs-worker
bit-exactly, topology-vs-topology to float-reduction-order tolerance.

This is the executable form of the multi-host claim (SURVEY.md §5.8,
docs/PARALLELISM.md); tools/demo_multihost.py holds the logic.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "demo_multihost.py")


def test_two_process_training_matches_single_process():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["GYM_SOCCER_TPU_MH_PORT"] = "12977"  # avoid clashing with manual runs
    out = subprocess.run(
        [sys.executable, TOOL], capture_output=True, text=True,
        timeout=560, env=env)
    assert out.returncode == 0, f"\n{out.stdout}\n{out.stderr}"
    assert "MULTIHOST OK" in out.stdout, out.stdout
