"""Test harness: force an 8-device virtual CPU mesh before JAX backends init.

This is the standard JAX pattern for exercising sharded collectives without
TPU hardware (SURVEY.md §4); all tests run on CPU. The environment may carry
an `axon` TPU plugin whose sitecustomize registers the real TPU at interpreter
startup and pins `jax_platforms="axon,cpu"` via jax.config — so we override
the *config* (not just the env var) before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
