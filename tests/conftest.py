"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use the
standard fake backend (`--xla_force_host_platform_device_count`).  Must be
set before jax is imported anywhere.
"""

import os
import sys

# Force-override: the axon sitecustomize hook re-sets JAX_PLATFORMS=axon at
# interpreter start, which would route every test through the real-TPU tunnel
# (~100 s handshake + remote compile per op).  Tests always run on the fake
# multi-device CPU backend; belt and braces because the hook may have eagerly
# registered (or even initialized) the axon backend already.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
assert jax.default_backend() == "cpu", "tests must not run through the TPU tunnel"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
