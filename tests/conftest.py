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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
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
