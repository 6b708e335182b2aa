"""Persistent XLA compilation cache, shared by tests/bench/CLI drivers.

The 12-table prover compiles dozens of large XLA programs (per-table
quotient schedules, commit/Merkle, FRI chains); cold-compile dominates
wall time (BASELINE.md round-2 notes: 3276 s cold vs 182 s warm on the
4-table TPU path).  Caching the executables on disk makes every process
after the first warm.

The cache dir is partitioned by a host fingerprint: XLA:CPU AOT results
are machine-specific, and a cache populated on one box silently computes
WRONG values on another (observed in round 2: constraint accumulators
nonzero only in the cached-executable path; XLA logs "machine features
mismatch ... could lead to execution errors").  Rounds can migrate
hosts, so entries are never shared across CPU models.  TPU executables
are keyed by the backend inside XLA's own cache key, so the same
partitioning is safe for them too.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_cache_dir(root: str = "/root/repo/.jax_cache") -> str:
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


def enable_persistent_cache(root: str = "/root/repo/.jax_cache") -> str:
    """Point JAX's compilation cache at the host-partitioned dir."""
    import jax

    path = host_cache_dir(root)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
