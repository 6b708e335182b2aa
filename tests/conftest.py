"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize pins JAX_PLATFORMS=axon (remote TPU tunnel),
which would make every tiny test compile over the tunnel; tests instead run
on 8 virtual CPU devices.  Multi-chip sharding paths are validated on this
virtual mesh (the driver separately dry-runs
`__graft_entry__.dryrun_multichip`); real-TPU benchmarks live in bench.py.
"""

import os

# Silence XLA's per-load AOT-cache machine-feature notices (glog ERROR spam).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

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

# x64 switches the Goldilocks internals to the compact uint64 path (~3x
# smaller compiled graphs; see zkm_tpu/field/goldilocks.py).
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: compiled kernels survive across test runs.
# The dir is partitioned by a host-CPU fingerprint: XLA:CPU AOT results are
# machine-specific, and a cache populated on one box silently computes WRONG
# values on another (observed: constraint accumulators nonzero only in the
# cached-executable path; XLA logs "machine features mismatch ... could lead
# to execution errors").  Rounds can migrate hosts, so never share entries.
def _host_cache_dir(root="/root/repo/.jax_cache"):
    import hashlib
    import platform
    tag = platform.machine()
    try:
        lines = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                # flags alone are not enough: XLA also bakes model-derived
                # tuning prefs (prefer-no-scatter/gather) into AOT results.
                if line.startswith(("flags", "model name", "vendor_id")):
                    lines.append(line)
                if len(lines) == 3:
                    break
        tag += hashlib.sha256("".join(lines).encode()).hexdigest()[:12]
    except OSError:
        pass
    return os.path.join(root, tag)


_cache_dir = _host_cache_dir()
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
