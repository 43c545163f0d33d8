"""Two-process multi-host bring-up smoke: proves parallel.mesh.init_distributed
(the NCCL init_process_group equivalent, detectron2.7z!engine/launch.py:94-109)
initializes a 2-process JAX distributed runtime over DCN (localhost) and runs
one cross-process collective.

Run directly (spawns its own worker pair):
  JAX_PLATFORMS=cpu python tools/multihost_smoke.py
Or as one worker:
  python tools/multihost_smoke.py --worker --port P --pid {0,1}
"""

import argparse
import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(port: int, pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from faster_orefsdet_tpu.parallel.mesh import init_distributed

    init_distributed(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2 * len(jax.local_devices())

    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray([pid + 1.0]))
    assert gathered.reshape(-1).tolist() == [1.0, 2.0], gathered
    multihost_utils.sync_global_devices("smoke-done")
    print(f"worker {pid}: process_count=2, allgather ok")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--pid", type=int, default=0)
    args = p.parse_args()
    if args.worker:
        worker(args.port, args.pid)
        return

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--port", str(port), "--pid", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    ok = True
    for i, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=300)
        print(f"--- worker {i} (rc={pr.returncode}) ---\n{out}")
        ok &= pr.returncode == 0
    if not ok:
        raise SystemExit(1)
    print("multihost smoke OK: 2-process DCN bring-up + cross-process allgather")


if __name__ == "__main__":
    main()
