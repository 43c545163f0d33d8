"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (the JAX-native substitute for the reference's real-process-only
multi-GPU testing — see SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter startup, latching
# JAX_PLATFORMS=axon before this file runs — override via the config API.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test (subprocess compiles)")
    # Build the native COCOeval fast path so test_native_cocoeval.py runs
    # instead of silently skipping in a fresh checkout (VERDICT r2 #5).
    import pathlib
    import subprocess

    native = pathlib.Path(__file__).resolve().parent.parent / "native"
    if not (native / "libcocoeval.so").exists():
        try:
            subprocess.run(["make", "-C", str(native)], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # no toolchain → the equivalence test skips
            print(f"native build unavailable ({e}); numpy COCOeval only")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
