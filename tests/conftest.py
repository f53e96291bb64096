"""Test harness config: force CPU with 8 virtual devices.

No TPU exists in CI; multi-chip sharding is validated the idiomatic JAX way,
via xla_force_host_platform_device_count (SURVEY.md §4).

Note: this environment's sitecustomize registers a TPU PJRT plugin and pins
jax_platforms itself, so the env var alone is not enough — we must override
via jax.config before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
