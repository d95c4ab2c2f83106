"""Test environment: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests (detax.dist / pjit train step) run on a virtual
8-device CPU mesh, per the framework test strategy in SURVEY.md §4 — real TPU
pods are not needed for correctness tests. Must run before jax initializes.
"""

import os

# Force CPU even when the ambient environment points at a TPU (JAX_PLATFORMS
# may be preset to a remote-tunnel platform): unit tests must be local.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: compile once, reruns are fast (this box has a
# single CPU core — XLA compiles dominate test wall-clock otherwise).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detax_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

# The environment's sitecustomize registers a remote-TPU PJRT plugin and
# force-sets jax_platforms="axon,cpu" *programmatically*, overriding the env
# var — undo that so unit tests really run on the local 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "multihost: spawns coordinated multi-process jax.distributed workers"
    )
    config.addinivalue_line(
        "markers", "slow: micro-training quality gates (minutes on one CPU core)"
    )
