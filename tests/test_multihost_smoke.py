"""2-process multi-host bring-up (parallel.mesh.init_distributed — the
reference's dist.init_process_group('NCCL') analog, engine/launch.py:94-109).
Spawns tools/multihost_smoke.py, which launches two local CPU processes,
initializes the JAX distributed runtime between them, and runs a
cross-process allgather."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_multihost_bringup():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py")],
        env=env, capture_output=True, text=True, timeout=360,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "multihost smoke OK" in proc.stdout
