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
    # Partition per BACKEND (VERDICT r3 item 1): a poisoned or
    # cross-machine XLA:CPU AOT entry segfaults the process at cache-LOAD
    # time (observed: SIGSEGV inside get_executable_and_time during the
    # test suite).  Separate dirs mean a bad CPU entry can never take
    # down a TPU run, and a wipe of one platform's entries keeps the
    # other's warmth.
    import jax
    backend = jax.default_backend()
    if backend != "cpu":
        # Accelerator executables target the DEVICE, not the host CPU —
        # they are valid from any host, so the cache must be shared
        # across hosts (rounds migrate machines; a host-tagged dir would
        # orphan every previous round's TPU warm-up).
        return os.path.join(root, backend)
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
    return os.path.join(root, f"{tag}_{backend}")


def enable_persistent_cache(root: str = "/root/repo/.jax_cache") -> str:
    """Point JAX's compilation cache at the host-partitioned dir."""
    import jax

    path = host_cache_dir(root)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


def install_compile_monitor() -> dict:
    """Count XLA compilations + time spent compiling (VERDICT r3 item 9:
    log the number of distinct compiled graphs and the compile share of
    wall-clock).  Returns a live stats dict: {"compiles", "secs",
    "cache_hits"}."""
    import jax

    stats = {"compiles": 0, "secs": 0.0, "cache_hits": 0}

    def _on_duration(event: str, duration: float, **kw):
        if "backend_compile" in event:
            stats["compiles"] += 1
            stats["secs"] += duration

    def _on_event(event: str, **kw):
        if "cache_hit" in event:
            stats["cache_hits"] += 1

    jax.monitoring.register_event_duration_secs_listener(_on_duration)
    try:
        jax.monitoring.register_event_listener(_on_event)
    except Exception:
        pass
    return stats
