"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip code paths (pjit/shard_map over a Mesh) are exercised on CPU with
``--xla_force_host_platform_device_count=8`` so no TPU hardware is required,
mirroring the strategy described in SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize force-registers the TPU platform (jax_platforms
# becomes "axon,cpu") regardless of JAX_PLATFORMS; override it here before
# any backend initialisation so tests run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
