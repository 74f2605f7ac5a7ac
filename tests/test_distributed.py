"""Multi-process distributed decode: N CPU processes, one global mesh.

SURVEY.md §2.5 comm-backend row / VERDICT r1 missing #2: the
jax.distributed path, exercised without a cluster by launching worker
subprocesses each owning 4 virtual CPU devices.  Workers shard the
corpus by global frame index (process-local ingestion), decode over the
global mesh, and verify (a) globally-psummed accounting scalars and
(b) bit-exact local PCM shards.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nprocs", [2])
def test_multiprocess_decode_bit_exact(nprocs):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # Workers must not inherit this test process's compilation-cache lock
    # contention or TPU tunnel; CPU platform is forced in the worker too.
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(nprocs), str(pid)],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"proc {pid}/{nprocs}: OK" in out
