"""jit onto the host CPU backend for latency-bound helper computations.

Witness generation and trace building are small, dispatch-latency-bound
computations (page-hash sponges, per-op permutation chains).  When the
default JAX platform is a remote TPU (axon tunnel), running them there
costs a round trip per dispatch and a tunnel compile per shape —
observed: 10 s witness generation for an 11-instruction segment, 37 s
for a PoseidonSponge trace build that takes <1 s on the host CPU.  The
big prover kernels (commit/quotient/FRI) stay on the default device;
everything routed through `host_jit` runs on the in-process CPU backend.
"""

from __future__ import annotations

import contextvars

import jax

# True while tracing a host-pinned function.  Device-dispatch heuristics
# that branch on `jax.default_backend()` (e.g. the Pallas Poseidon path in
# hash/poseidon.py) must also consult this: the default backend stays
# "tpu" even when the computation is being lowered for the CPU backend.
ON_HOST: contextvars.ContextVar = contextvars.ContextVar(
    "zkm_host_jit", default=False)


def _has_cpu_backend() -> bool:
    try:
        jax.local_devices(backend="cpu")
        return True
    except RuntimeError:
        return False


def host_jit(fn, **kw):
    """jax.jit pinned to the CPU backend when one is registered."""
    if not _has_cpu_backend():
        return jax.jit(fn, **kw)

    def wrapped(*a, **k):
        tok = ON_HOST.set(True)
        try:
            return fn(*a, **k)
        finally:
            ON_HOST.reset(tok)

    return jax.jit(wrapped, backend="cpu", **kw)
