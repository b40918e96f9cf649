"""A REAL 2-process ``jax.distributed`` run (CPU backend).

The round-2 review confirmed the old bootstrap could never work in an
actual multi-process launch (it touched the XLA backend before
``jax.distributed.initialize``). This test pins the fix by launching
two genuine OS processes that form a cluster over a local coordinator,
build a 4-device global mesh (2 virtual CPU devices per process), and
run one data-parallel odometry train step whose gradient reduction
crosses the process boundary (see ``tests/distributed_worker.py``).

New capability vs the reference, which is single-process single-GPU
(ref: neural_slam.py:51; SURVEY.md 2.26/5.8).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

from atdn_vslam_tpu.parallel import distributed

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_initialize_noop_after_backend_touch():
    """Single-process: initialize() must stay a no-op (and not raise)
    even though this test process has long since initialized XLA."""
    import jax

    jax.devices()  # backend is certainly live in the test process
    assert distributed.initialize() is False


def test_multiprocess_config_resolution(monkeypatch):
    assert distributed.multiprocess_config() is None
    # explicit args win
    cfg = distributed.multiprocess_config("h:1", 2, 1)
    assert cfg == ("h:1", 2, 1)
    # env fallback
    monkeypatch.setenv(distributed.ENV_COORDINATOR, "c:9")
    monkeypatch.setenv(distributed.ENV_NUM_PROCESSES, "4")
    monkeypatch.setenv(distributed.ENV_PROCESS_ID, "3")
    assert distributed.multiprocess_config() == ("c:9", 4, 3)
    # partial config is an error, not a silent no-op
    monkeypatch.delenv(distributed.ENV_PROCESS_ID)
    with pytest.raises(ValueError):
        distributed.multiprocess_config()


@pytest.mark.slow
def test_two_process_cluster():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # hermetic CPU workers: no TPU tunnel, 2 virtual devices each
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env[distributed.ENV_COORDINATOR] = f"127.0.0.1:{port}"
        env[distributed.ENV_NUM_PROCESSES] = "2"
        env[distributed.ENV_PROCESS_ID] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests",
                                              "distributed_worker.py")],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out, out
    # both processes computed the same (global, psum'd) loss
    losses = {o.split("loss=")[1].split()[0] for o in outs}
    assert len(losses) == 1, outs
