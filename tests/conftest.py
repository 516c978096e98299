"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on host CPU devices (SURVEY.md §4 item 5);
the real-TPU path is exercised by the driver via bench.py / __graft_entry__.

Note: this environment pre-imports jax via a sitecustomize hook, so plain
env vars are too late — we must go through jax.config before first backend
use. XLA_FLAGS is still read lazily at backend-client creation, so setting
it here works as long as no jax computation ran at import time.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(2021)
