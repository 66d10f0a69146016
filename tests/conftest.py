"""Test env: run on CPU with 8 virtual devices so sharding tests work without
TPU hardware (SURVEY.md §4 "distributed without a cluster").

The harness boot hook (sitecustomize) registers the real-TPU "axon" backend
and pins ``jax_platforms="axon,cpu"`` via jax.config — which overrides the
JAX_PLATFORMS env var — so we must re-update the config here, before any
backend initializes. Running tests on the TPU tunnel would make every distinct
jit shape a slow remote compile; numerics and sharding are validated on host,
while bench.py exercises the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
