"""Multi-host (2-process) execution of the GAN training loop on a CPU 'pod'.

Round-2 gap: every test ran 1 process x 8 virtual devices, so the
multi-host code paths (jax.distributed.initialize, rank-0 gating,
global-batch placement onto a process-spanning mesh, the
all-processes-enter-orbax-save barrier, cross-process restore) were
reasoned-about but never executed.  This launches tests/multihost_driver.py
twice (process_id 0/1, 4 virtual CPU devices each -> 8 global) and checks:

* both processes finish 2 GAN train steps and report the SAME parameter
  digest (replicated params stayed in sync across the pod),
* run artifacts (checkpoints, logs) were written by process 0 only,
* a second 2-process launch restores the step-2 checkpoint and continues
  to step 4 (the orbax save/restore barrier works across processes).

Reference equivalent: Lightning DDP multi-node training
(/root/reference/open_universe/utils/ddp.py:24-66).
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_pod(data, run, max_steps, resume=False, timeout=1800):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4"
        # see conftest: raise the CPU collective rendezvous abort timeouts,
        # which a contended 1-core host can trip spuriously
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=900")
    # drop any inherited single-process test config
    env.pop("JAX_PLATFORMS", None)
    procs = []
    for pid in (0, 1):
        cmd = [sys.executable, str(REPO / "tests" / "multihost_driver.py"),
               "--coordinator", f"127.0.0.1:{port}",
               "--process-id", str(pid), "--num-processes", "2",
               "--data", str(data), "--run", str(run),
               "--max-steps", str(max_steps)]
        if resume:
            cmd.append("--resume")
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"process {pid} rc={p.returncode}\n{out[-4000:]}")
    return outs


def _parse_ok(out):
    for line in out.splitlines():
        if line.startswith("MULTIHOST_OK"):
            parts = dict(kv.split("=") for kv in line.split()[2:])
            return int(parts["step"]), float(parts["digest"])
    raise AssertionError(f"no MULTIHOST_OK line:\n{out[-4000:]}")


@pytest.mark.slow
def test_two_process_gan_train_checkpoint_resume(tmp_path):
    from test_e2e_train import _make_dataset

    data = tmp_path / "data"
    _make_dataset(data, n_train=16, n_val=2, n_test=2)
    run = tmp_path / "run"

    # ---- phase 1: fresh 2-step fit, checkpoint at step 2
    outs = _launch_pod(data, run, max_steps=2)
    (s0, d0), (s1, d1) = _parse_ok(outs[0]), _parse_ok(outs[1])
    assert s0 == 2 and s1 == 2
    np.testing.assert_allclose(d0, d1, rtol=0, atol=0,
                               err_msg="replicated params diverged")

    ckpt_dir = run / "checkpoints"
    assert (ckpt_dir / "step_00000002").is_dir()
    assert (ckpt_dir / "last.json").exists()

    # rank gating: exactly one process wrote the run artifacts (events
    # files / configs are unique, not duplicated per process)
    tb_events = list(run.glob("**/events.out.tfevents.*"))
    assert len(tb_events) <= 1, tb_events

    # ---- phase 2: 2-process restore, train to step 4
    outs = _launch_pod(data, run, max_steps=4, resume=True)
    (s0, d0), (s1, d1) = _parse_ok(outs[0]), _parse_ok(outs[1])
    assert s0 == 4 and s1 == 4
    np.testing.assert_allclose(d0, d1, rtol=0, atol=0)
    assert (ckpt_dir / "step_00000004").is_dir()
