"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
paths compile and run without TPU hardware (SURVEY.md §7 / driver contract).

Under the axon TPU tunnel, JAX_PLATFORMS env alone does not demote the TPU
plugin; the jax.config update below does.
"""
import os

# force, don't setdefault: the session profile exports JAX_PLATFORMS=axon,
# and catgrasp_tpu/__init__.py re-applies the env var to jax.config on
# import (its own tunnel workaround) — a setdefault here would let the
# package re-promote the real TPU inside the test process
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
