"""Test configuration.

Force JAX onto the host CPU backend with 8 virtual devices so that
multi-chip (data-parallel / tensor-parallel) code paths are exercised
without TPU hardware.  Note: something in the pytest startup chain imports
jax before this conftest runs, so plain env vars are too late for
JAX_PLATFORMS — we use jax.config.update, which works as long as no backend
has been initialized yet.  XLA_FLAGS is read at backend-init time, so the
env route still works for the host device count.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU's in-process collective rendezvous CHECK-aborts the process
    # when a participant is >40 s late (rendezvous.cc termination timeout).
    # On this 1-core host 8 device threads time-slice a single core, so a
    # contended run can trip it spuriously (observed: SIGABRT in an
    # all-reduce while a TPU soak shared the core).  Raise warn/terminate
    # far above any plausible time-slice stall.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test; `-m 'not slow'` is the fast path "
        "(see CLAUDE.md Commands)")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _check_cpu():
    assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
    yield
