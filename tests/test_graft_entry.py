"""Driver-contract tests for __graft_entry__.dryrun_multichip.

Round-1 failure mode: the driver runs `dryrun_multichip(8)` in a fresh
process with the ambient environment (axon sitecustomize exporting
JAX_PLATFORMS=axon), where the function initialized the single-chip TPU
backend and died. The fix pins cpu + n virtual devices via the config API
inside the function itself; this test proves it by spawning a subprocess
WITHOUT the conftest env pins (the conftest sets JAX_PLATFORMS=cpu and the
XLA device-count flag in os.environ — we strip both from the child env so
the child sees exactly what the driver's process would).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_like_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "xla_force_host_platform_device_count" not in f
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.slow
def test_dryrun_multichip_fresh_subprocess():
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=REPO,
        env=_driver_like_env(),
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip(8) ok:" in proc.stdout


def test_make_mesh_refuses_short_device_list():
    from faster_orefsdet_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="Refusing to silently truncate"):
        make_mesh(10_000)
