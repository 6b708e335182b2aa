"""Multi-chip sharding of the proving pipeline.

Reference mapping (SURVEY.md §2.7): the reference is a single-process CPU
prover; its natural parallel axes are
  * dp — independent *segments* (embarrassingly parallel proofs),
  * tp — trace *columns* within one segment (iNTT/LDE/leaf-hash per column),
with Merkle-leaf hashing needing an all-gather of column shards (XLA inserts
it from the sharding constraints; rides ICI on a real slice).

`sharded_commit_step` is the canonical multi-chip step: a batch of segment
traces sharded (dp, tp) through iNTT -> coset LDE -> leaf digests -> caps.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import goldilocks as gl
from ..field import ntt
from ..hash import poseidon as ps


def make_mesh(devices=None, dp: int = None, tp: int = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None or tp is None:
        # favor tp (columns) since single-segment latency matters most
        tp = tp or max(1, n // 2)
        dp = dp or n // tp
    arr = np.array(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def commit_step(traces: gl.Gf, rate_bits: int, cap_height: int):
    """(S, C, N) segment traces -> (coeffs, leaf digests, caps).

    Pure function; shard over (dp=segments, tp=columns) via pjit below.
    """
    coeffs = ntt.intt(traces)                       # along last axis
    lde_nat = ntt.lde(coeffs, rate_bits)            # (S, C, M)
    m = lde_nat[0].shape[-1]
    rev = ntt.bit_reverse_indices(m.bit_length() - 1)
    lde_rev = gl.take(lde_nat, rev, axis=-1)
    # leaves: (S, M, C) — the transpose gathers column shards (all-gather
    # over tp inserted by XLA)
    leaves = (jnp.swapaxes(lde_rev[0], -1, -2),
              jnp.swapaxes(lde_rev[1], -1, -2))
    digests = ps.hash_or_noop(leaves)               # (S, M, 4)
    # fold up to the cap
    level = digests
    while level[0].shape[-2] > (1 << cap_height):
        left = gl.getitem(level, (Ellipsis, slice(0, None, 2), slice(None)))
        right = gl.getitem(level, (Ellipsis, slice(1, None, 2), slice(None)))
        level = ps.two_to_one(left, right)
    return coeffs, digests, level


def make_sharded_commit_step(mesh: Mesh, rate_bits: int = 2,
                             cap_height: int = 4):
    """jit of commit_step with (dp, tp) shardings bound to `mesh`."""
    trace_sharding = NamedSharding(mesh, P("dp", "tp", None))

    @partial(jax.jit, static_argnums=(1, 2))
    def step(traces, rate_bits, cap_height):
        traces = jax.lax.with_sharding_constraint(
            traces, (trace_sharding, trace_sharding))
        coeffs, digests, caps = commit_step(traces, rate_bits, cap_height)
        coeffs = jax.lax.with_sharding_constraint(
            coeffs, (trace_sharding, trace_sharding))
        return coeffs, digests, caps

    return lambda traces: step(traces, rate_bits, cap_height)
