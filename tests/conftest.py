"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize pins JAX_PLATFORMS=axon (remote TPU tunnel),
which would make every tiny test compile over the tunnel; tests instead run
on 8 virtual CPU devices.  Multi-chip sharding paths are validated on this
virtual mesh (the driver separately dry-runs
`__graft_entry__.dryrun_multichip`); real-TPU benchmarks live in bench.py.
"""

import os

# Must be set before the first jax backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize registers its backend regardless of env vars; the
# config knob wins over it.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
