"""Multi-host DCN wiring integration test (no hardware required).

Two coordinated CPU processes (2 virtual devices each) run one data-parallel
VAE train step over a 4-device GLOBAL mesh and must produce the same loss as
a single process with 4 local devices — proving jax.distributed setup, the
process-aware mesh, host-local->global batch assembly, and the SPMD train
step compose across process boundaries.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
WORKER = REPO / "tools" / "dist_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env["PYTHONPATH"] = str(REPO)
    return env


def _parse_loss(stdout: str) -> float:
    for line in stdout.splitlines():
        if line.startswith("LOSS "):
            return float(line.split()[1])
    raise AssertionError(f"no LOSS line in output:\n{stdout}")


def test_two_process_dp_step_matches_single_process():
    port = _free_port()

    # 2 processes x 2 devices: coordinator (rank 0) + worker (rank 1)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(rank), "2", str(port)],
            cwd=REPO, env=_env(2),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            assert p.returncode == 0, \
                f"rank failed (rc={p.returncode}):\n{out}\n{err}"
            outs.append(out)
    finally:
        # a hung/failed rank must not leave orphaned jax.distributed workers
        # holding the coordinator port past the test
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait(timeout=30)
    losses = [_parse_loss(o) for o in outs]
    assert losses[0] == losses[1], "processes disagree on the pmean'd loss"

    # single process, 4 local devices: same global mesh size, same shards
    single = subprocess.run(
        [sys.executable, str(WORKER), "0", "1", str(port)],
        cwd=REPO, env=_env(4), capture_output=True, text=True, timeout=240,
    )
    assert single.returncode == 0, single.stderr
    ref = _parse_loss(single.stdout)

    np.testing.assert_allclose(losses[0], ref, rtol=1e-6)
