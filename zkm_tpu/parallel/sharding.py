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


def quotient_step(stark, coeffs: gl.Gf, alphas, degree_bits: int):
    """(S, C, N) trace coeffs -> (S, n_alphas, 2N) alpha-combined
    vanishing values on the 2N quotient coset (prover._quotient_core over
    a dp batch of segments, stark-only constraints).

    Constraint evaluation is pointwise over the coset, so the natural tp
    axis is the *evaluation points*: each device evaluates every
    constraint on its point shard; the next-row roll induces a boundary
    permute that XLA lowers to a collective on a real mesh."""
    from ..stark.algebra import BatchAlgebra
    from ..stark.constraint_consumer import ConstraintConsumer
    from ..stark.expr import evaluate_scheduled, feed_consumer
    from ..stark.vanishing_poly import compile_vanishing

    n = 1 << degree_bits
    m = 2 * n
    sched = compile_vanishing(stark, 0, (), 0)

    lde = ntt.lde(coeffs, 1)                          # (S, C, 2N)

    def roll(x, k):
        return (jnp.concatenate([x[0][..., k:], x[0][..., :k]], axis=-1),
                jnp.concatenate([x[1][..., k:], x[1][..., :k]], axis=-1))

    nxt = roll(lde, 2)

    from ..field.goldilocks import P
    g = gl.primitive_root_of_unity(degree_bits)
    w = gl.primitive_root_of_unity(degree_bits + 1)
    pw = gl.host_powers(w, m).astype(object)
    xs = gl.from_u64(((pw * gl.GENERATOR) % P).astype(np.uint64))
    g_last = gl.host_pow(g, n - 1)
    z_last = gl.sub(xs, gl.full((), g_last))

    outs = []
    s_count = lde[0].shape[0]
    for s in range(s_count):
        trace = (lde[0][s], lde[1][s])
        trace_nxt = (nxt[0][s], nxt[1][s])
        consumer = ConstraintConsumer(
            BatchAlgebra(m), [gl.full((), a) for a in alphas], z_last,
            gl.zeros((m,)), gl.zeros((m,)))
        cvals = evaluate_scheduled(sched, trace, trace_nxt, [])
        feed_consumer(sched, cvals, consumer)
        outs.append(consumer.accs)
    lo = jnp.stack([jnp.stack([acc[0] for acc in accs]) for accs in outs])
    hi = jnp.stack([jnp.stack([acc[1] for acc in accs]) for accs in outs])
    return (lo, hi)


def make_sharded_quotient_step(mesh: Mesh, stark, alphas,
                               degree_bits: int):
    """jit of quotient_step: segments over dp, coset points over tp."""
    in_shard = NamedSharding(mesh, P("dp", None, "tp"))
    out_shard = NamedSharding(mesh, P("dp", None, "tp"))

    @jax.jit
    def step(coeffs):
        coeffs = jax.lax.with_sharding_constraint(
            coeffs, (in_shard, in_shard))
        q = quotient_step(stark, coeffs, alphas, degree_bits)
        return jax.lax.with_sharding_constraint(q, (out_shard, out_shard))

    return step


def fri_fold_step(values: gl.Gf, beta, arity_bits: int = 2):
    """One FRI fold: (S, M) codeword values -> (S, M/arity) by combining
    each stride-M/arity coset group with powers of beta (value-space fold,
    fri/prover.py semantics)."""
    m = values[0].shape[-1]
    arity = 1 << arity_bits
    stride = m // arity
    groups = (values[0].reshape(*values[0].shape[:-1], arity, stride),
              values[1].reshape(*values[1].shape[:-1], arity, stride))
    acc = (groups[0][..., arity - 1, :], groups[1][..., arity - 1, :])
    beta_gf = gl.full((), beta)
    for i in reversed(range(arity - 1)):
        acc = gl.add(gl.mul(acc, beta_gf),
                     (groups[0][..., i, :], groups[1][..., i, :]))
    return acc


def make_sharded_fri_fold(mesh: Mesh, beta, arity_bits: int = 2):
    """jit of fri_fold_step: segments over dp, codeword points over tp.
    The fold's reshape regroups points, inducing the tp reshard."""
    in_shard = NamedSharding(mesh, P("dp", "tp"))

    @jax.jit
    def step(values):
        values = jax.lax.with_sharding_constraint(
            values, (in_shard, in_shard))
        out = fri_fold_step(values, beta, arity_bits)
        return jax.lax.with_sharding_constraint(out, (in_shard, in_shard))

    return step
