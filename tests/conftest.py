"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the standard JAX pattern for exercising sharded collectives without
TPU hardware (SURVEY.md §4); all tests run on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
