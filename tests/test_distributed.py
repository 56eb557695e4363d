"""Multi-host DCN wiring integration tests (no hardware required).

Coordinated CPU processes (2 virtual devices each) run data-parallel VAE
train steps over a GLOBAL mesh and must produce the same loss as a single
process with the same total device count — proving jax.distributed setup,
the process-aware mesh, host-local->global batch assembly, and the SPMD
train step compose across process boundaries. Covered topologies: 2x2 and
4x2 (the reference has no distributed layer at all — SURVEY.md §2.4).

Failure characterization (measured on this JAX version, pinned here so a
behavior change is caught):

- A process missing at init: every present process FATALLY ABORTS with
  DEADLINE_EXCEEDED / RegisterTask once ``initialization_timeout`` expires
  (default 300 s; our wrapper exposes the knob). No hang.
- A process dying in steady state (between steps): the coordination
  service's heartbeat detector kills the survivors with "tasks are
  unhealthy (stopped sending heartbeats)" after ~100 s. No hang.
- (Not pinned, observed once: dying between distributed init and backend
  init raises RuntimeError "Getting local topologies failed" after the
  2-minute key-value timeout.)

The SPMD failure model is therefore restart-the-world: launchers should
treat any nonzero worker exit as a whole-job restart signal, resuming from
the trainer's checkpoints (utils/checkpoint.py).
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

# same opt-in convention as tests/test_cli.py's chain tests
slow = pytest.mark.skipif(os.environ.get("SHM_TPU_SLOW_TESTS") != "1",
                          reason="set SHM_TPU_SLOW_TESTS=1 to run")


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


def _parse_loss(stdout: str, tag: str = "LOSS") -> float:
    for line in stdout.splitlines():
        if line.startswith(f"{tag} "):
            return float(line.split()[1])
    raise AssertionError(f"no {tag} line in output:\n{stdout}")


def _launch(rank: int, nproc: int, port: int, *flags: str,
            local_devices: int = 2) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, str(WORKER), str(rank), str(nproc), str(port),
         *flags],
        cwd=REPO, env=_env(local_devices),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def _communicate_all(procs, timeout: int):
    """(returncode, stdout, stderr) per proc; kills stragglers on timeout so
    a hung rank can never leak past the test holding the coordinator port."""
    results = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            results.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait(timeout=30)
    return results


@pytest.mark.parametrize("nproc", [2, pytest.param(4, marks=slow)])
def test_multi_process_dp_step_matches_single_process(nproc):
    port = _free_port()
    procs = [_launch(rank, nproc, port) for rank in range(nproc)]
    results = _communicate_all(procs, timeout=300)
    for rc, out, err in results:
        assert rc == 0, f"rank failed (rc={rc}):\n{out}\n{err}"
    losses = [_parse_loss(out) for _, out, _ in results]
    assert len(set(losses)) == 1, \
        f"processes disagree on the pmean'd loss: {losses}"

    # single process, nproc*2 local devices: same global mesh size/shards
    single = subprocess.run(
        [sys.executable, str(WORKER), "0", "1", str(port)],
        cwd=REPO, env=_env(2 * nproc), capture_output=True, text=True,
        timeout=300,
    )
    assert single.returncode == 0, single.stderr
    np.testing.assert_allclose(losses[0], _parse_loss(single.stdout),
                               rtol=1e-6)


def test_missing_worker_raises_within_timeout():
    """A cluster member that never arrives must not hang the others: with
    initialization_timeout=15 the lone coordinator aborts (not hangs) with
    the RegisterTask deadline error in ~20 s."""
    port = _free_port()
    proc = _launch(0, 2, port, "--init-timeout", "15")
    [(rc, out, err)] = _communicate_all([proc], timeout=120)
    assert rc != 0, f"expected failure, got success:\n{out}"
    assert "DEADLINE_EXCEEDED" in err or "RegisterTask" in err, err[-2000:]


@slow
def test_steady_state_worker_death_is_detected():
    """A worker dying BETWEEN steps (after a successful collective) must
    take the survivors down via the heartbeat detector — bounded (~100 s),
    never a silent hang. The survivor's first step still completed and both
    ranks agreed on its loss before the death."""
    port = _free_port()
    survivor = _launch(0, 2, port, "--two-steps")
    dier = _launch(1, 2, port, "--die-after-step")
    (rc0, out0, err0), (rc1, out1, _) = _communicate_all(
        [survivor, dier], timeout=240)

    assert rc1 == 9, f"dier should _exit(9), got {rc1}:\n{out1}"
    assert "DYING after step" in out1
    # step 1 completed on both sides with the same global loss
    np.testing.assert_allclose(_parse_loss(out0), _parse_loss(out1))
    # the survivor must FAIL (heartbeat detection), not hang or succeed
    assert rc0 != 0, f"survivor unexpectedly succeeded:\n{out0}"
    assert "heartbeat" in err0 or "unhealthy" in err0, err0[-2000:]
