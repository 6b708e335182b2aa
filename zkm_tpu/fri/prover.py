"""FRI prover: value-space folding on device, transcript on host.

Reference analog: plonky2 `fri_proof` / `PolynomialBatch::prove_openings`
(SURVEY.md §3.2 "FRI: fold arity 16, 37 queries, PoW 16 bits").

TPU-first design decisions:
  * All folding happens in *value space* on the bit-reversed LDE — an
    arity-2^k fold with beta equals k successive radix-2 folds with
    beta^(2^t), each a fully-parallel elementwise kernel (no sequential
    coefficient division, no synthetic division scan).
  * The initial combined polynomial (the alpha-batched opening quotients) is
    likewise computed in value space: (comp(x) - comp(z)) / (x - z)
    elementwise over the LDE domain with a batched inverse.
  * Proof-of-work grinding is a single batched permutation sweep on device.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field import extension as gl2
from ..field import ntt
from ..hash import poseidon as ps
from ..commit.merkle import MerkleTree, build_merkle_tree
from ..commit.polynomial_batch import PolynomialBatch
from ..iop.challenger import Challenger
from .config import FriConfig
from .proof import (FriInitialTreeProof, FriProof, FriQueryRound, FriQueryStep)

_INV2 = (gl.P + 1) // 2


@lru_cache(maxsize=None)
def _even_point_invs(log_m: int, shift: int):
    """1/x_j for the even element of pair j on a bit-reversed domain (numpy).

    Domain: shift * H, |H| = 2^log_m; pair j's even element is global index
    2j, i.e. point shift * w^{rev_{log_m-1}(j)} with w of order 2^log_m.
    Host-computed so it is a trace-safe constant.
    """
    w_inv = gl.host_inv(gl.primitive_root_of_unity(log_m))
    shift_inv = gl.host_inv(shift)
    half = 1 << (log_m - 1)
    pows = gl.host_powers(w_inv, half)
    rev = ntt.bit_reverse_indices(log_m - 1)
    vals = pows[rev].astype(object)
    vals = (vals * shift_inv) % gl.P
    arr = vals.astype(np.uint64)
    return ((arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (arr >> np.uint64(32)).astype(np.uint32))


def _fold_step_body(values: gl2.Gf2, beta: gl2.Gf2,
                    inv_xs: gl.Gf) -> gl2.Gf2:
    """One radix-2 fold: folded_j = (v_{2j}+v_{2j+1})/2 + beta*(v_{2j}-v_{2j+1})/(2 x_j)."""
    v0 = gl2.getitem(values, (slice(0, None, 2),))
    v1 = gl2.getitem(values, (slice(1, None, 2),))
    s = gl2.add(v0, v1)
    d = gl2.sub(v0, v1)
    term = gl2.mul(beta, gl2.mul_base(d, inv_xs))
    half = gl.full(s[0][0].shape, _INV2)
    return gl2.mul_base(gl2.add(s, term), half)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _fold_full(values: gl2.Gf2, b: gl2.Gf2, arity_bits: int,
               log_m: int, shift: int) -> gl2.Gf2:
    """All arity_bits radix-2 folds in one compiled call (one dispatch
    per layer instead of arity_bits — dispatch RTT dominates over a
    remote-TPU tunnel)."""
    for _ in range(arity_bits):
        inv_xs = _even_point_invs(log_m, shift)
        values = _fold_step_body(values, b, inv_xs)
        b = gl2.square(b)
        log_m -= 1
        shift = gl.host_mul(shift, shift)
    return values


def fold_layer(values: gl2.Gf2, beta: Tuple[int, int], arity_bits: int,
               log_m: int, shift: int) -> Tuple[gl2.Gf2, int, int]:
    """Arity-2^k fold = k radix-2 folds with beta^(2^t). Returns
    (folded values, new log size, new shift)."""
    b = gl2.scalar_from_u64s(*beta)
    values = _fold_full(values, b, arity_bits, log_m, shift)
    for _ in range(arity_bits):
        log_m -= 1
        shift = gl.host_mul(shift, shift)
    return values, log_m, shift


@partial(jax.jit, static_argnums=(1,))
def _chunk_leaves(values: gl2.Gf2, arity: int) -> gl.Gf:
    """(M,) ext values -> (M/arity, 2*arity) leaf rows [c0s | c1s]."""
    m = values[0][0].shape[0]
    c0 = gl.reshape(values[0], (m // arity, arity))
    c1 = gl.reshape(values[1], (m // arity, arity))
    lo = jnp.zeros((m // arity, 2 * arity), jnp.uint32)
    hi = jnp.zeros((m // arity, 2 * arity), jnp.uint32)
    lo = lo.at[:, :arity].set(c0[0]).at[:, arity:].set(c1[0])
    hi = hi.at[:, :arity].set(c0[1]).at[:, arity:].set(c1[1])
    return lo, hi


@partial(jax.jit, static_argnums=(1, 2))
def _chunk_and_tree(values: gl2.Gf2, arity: int, cap_height: int):
    """Leaf chunking + the whole Merkle build in one dispatch per layer."""
    from ..commit.merkle import build_levels_body
    leaves = _chunk_leaves.__wrapped__(values, arity)
    return leaves, build_levels_body(leaves, cap_height)


# ---------------------------------------------------------------------------
# Proof of work (batched grind on device).
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(2,))
def _pow_batch(state_with_inputs: jnp.ndarray, start: jnp.ndarray,
               min_hi_zero_bits: int) -> jnp.ndarray:
    """Try a batch of 2^16 candidates; returns first success index or -1.

    state_with_inputs: (2, 12) uint32 (lo, hi) rows with pending inputs
    already written; the candidate goes to slot `k` encoded as the first
    position whose marker... (k passed via the start array's second slot).
    """
    batch = 1 << 16
    k = start[1]
    cand = start[0] + jnp.arange(batch, dtype=jnp.uint32)
    lo = jnp.broadcast_to(state_with_inputs[0], (batch, 12)).copy()
    hi = jnp.broadcast_to(state_with_inputs[1], (batch, 12)).copy()
    # candidates are < 2^32 here (searched in order), so hi slot = 0
    lo = jax.vmap(lambda row, c: row.at[k].set(c))(lo, cand)
    hi = jax.vmap(lambda row, c: row.at[k].set(jnp.uint32(0)))(hi, cand)
    out = ps.permute((lo, hi))
    response_hi = out[1][:, ps.SPONGE_RATE - 1]
    ok = response_hi < (jnp.uint32(1) << (32 - min_hi_zero_bits))
    idx = jnp.argmax(ok)
    found = ok[idx]
    return jnp.where(found, idx.astype(jnp.int32), jnp.int32(-1))


def fri_proof_of_work(challenger: Challenger, config: FriConfig) -> int:
    """Find witness w such that observing w and squeezing one challenge
    yields proof_of_work_bits leading zero bits (challenger forked per try).

    NOTE: assumes the response is the challenge drawn immediately after
    observing the witness (duplex-challenger grind).  Kept isolated here as
    the single place to adjust for cross-verification against the reference.
    """
    base = challenger.clone()
    # Simulate observe(w) + duplexing: pending inputs then w at slot k.
    state = list(base.state)
    for i, x in enumerate(base.input_buffer):
        state[i] = x
    k = len(base.input_buffer)
    assert k < 8
    arr = np.array(state, dtype=np.uint64)
    st = np.stack([(arr & 0xFFFFFFFF).astype(np.uint32),
                   (arr >> 32).astype(np.uint32)])
    start = 0
    while True:
        res = int(_pow_batch(jnp.asarray(st),
                             jnp.array([start, k], dtype=np.uint32),
                             config.proof_of_work_bits))
        if res >= 0:
            witness = start + res
            # sanity-check on host
            c = challenger.clone()
            c.observe_element(witness)
            resp = c.get_challenge()
            assert resp >> (64 - config.proof_of_work_bits) == 0
            return witness
        start += 1 << 16
        assert start < 1 << 34, "PoW grind failed"


# ---------------------------------------------------------------------------
# Main prover entry.
# ---------------------------------------------------------------------------

def fri_prove(oracles: Sequence[PolynomialBatch],
              initial_values: gl2.Gf2,
              degree_bits: int,
              challenger: Challenger,
              config: FriConfig) -> FriProof:
    """Commit-fold-grind-query.

    `initial_values`: the alpha-combined opening-quotient polynomial
    evaluated over the (bit-reversed) LDE domain of size
    2^(degree_bits + rate_bits).  Caller has already observed oracle caps
    and drawn alpha.
    """
    log_m = degree_bits + config.rate_bits
    shift = gl.GENERATOR
    arities = config.reduction_arity_bits(degree_bits)

    values = initial_values
    layers: List[gl2.Gf2] = []
    trees = []
    caps = []
    for arity_bits in arities:
        arity = 1 << arity_bits
        layers.append(values)
        leaves, levels = _chunk_and_tree(values, arity, config.cap_height)
        tree = MerkleTree(levels=levels, cap_height=config.cap_height)
        trees.append((tree, leaves))
        cap = gl.to_u64(tree.cap)
        caps.append(cap)
        challenger.observe_cap(cap)
        beta = challenger.get_extension_challenge()
        values, log_m, shift = fold_layer(values, beta, arity_bits, log_m, shift)

    # Final polynomial: unfold bit-reversal, inverse coset NTT, trim to the
    # true degree (higher coefficients are identically zero).
    rev = ntt.bit_reverse_indices(log_m)
    vals_nat = gl2.take(values, rev, axis=0)
    final_coeffs = (ntt.coset_intt(vals_nat[0], shift),
                    ntt.coset_intt(vals_nat[1], shift))
    fdeg = 1 << (degree_bits - sum(arities))
    c0, c1, tail0, tail1 = gl.to_u64_many([
        gl.getitem(final_coeffs[0], slice(0, fdeg)),
        gl.getitem(final_coeffs[1], slice(0, fdeg)),
        gl.getitem(final_coeffs[0], slice(fdeg, None)),
        gl.getitem(final_coeffs[1], slice(fdeg, None))])
    assert not tail0.any() and not tail1.any(), "final poly not low-degree"
    final_poly = np.stack([c0, c1], axis=1)
    for i in range(fdeg):
        challenger.observe_extension((int(c0[i]), int(c1[i])))

    pow_witness = fri_proof_of_work(challenger, config)
    challenger.observe_element(pow_witness)
    # Draw the PoW response (mirrors the verifier so the transcripts stay in
    # lock-step before query-index sampling).
    response = challenger.get_challenge()
    assert response >> (64 - config.proof_of_work_bits) == 0

    lde_size = 1 << (degree_bits + config.rate_bits)
    indices = [challenger.get_challenge() % lde_size
               for _ in range(config.num_query_rounds)]

    query_rounds = extract_query_rounds(oracles, trees, arities, indices)
    return FriProof(commit_phase_merkle_caps=caps,
                    query_round_proofs=query_rounds,
                    final_poly=final_poly,
                    pow_witness=pow_witness)


def extract_query_rounds(oracles, trees, arities, indices):
    """Batched query extraction: gather rows + full Merkle paths for every
    (oracle | fold layer) on device first, then fetch EVERYTHING in ONE
    device->host round trip (each trip is ~125 ms over a remote-TPU
    tunnel; this block previously paid one per oracle/layer rows AND one
    per oracle/layer paths).

    trees: [(MerkleTree, leaves)] per commit-phase layer."""
    idx0 = np.asarray(indices, dtype=np.int64)
    oracle_rows_dev = [gl.take(o.leaves, idx0, axis=0) for o in oracles]
    oracle_paths_dev = [o.tree.open_batch_device(indices) for o in oracles]

    step_rows_dev = []
    step_paths_dev = []
    step_arities = []
    idx_arr = idx0
    for (tree, leaves), arity_bits in zip(trees, arities):
        arity = 1 << arity_bits
        coset_idx = idx_arr >> arity_bits
        step_rows_dev.append(gl.take(leaves, coset_idx, axis=0))
        step_paths_dev.append(tree.open_batch_device(coset_idx))
        step_arities.append(arity)
        idx_arr = coset_idx

    all_paths_dev = oracle_paths_dev + step_paths_dev
    fetched = gl.to_u64_many(
        oracle_rows_dev + step_rows_dev
        + [p for p in all_paths_dev if p is not None])
    k, m = len(oracles), len(step_rows_dev)
    oracle_rows = fetched[:k]
    step_rows = fetched[k:k + m]
    paths_iter = iter(fetched[k + m:])
    path_arrs = [next(paths_iter) if p is not None else None
                 for p in all_paths_dev]
    nq = len(indices)
    oracle_paths = [MerkleTree.paths_from_stacked(arr, nq)
                    for arr in path_arrs[:k]]
    step_data = [
        (arity, rows, MerkleTree.paths_from_stacked(arr, nq))
        for arity, rows, arr in zip(step_arities, step_rows,
                                    path_arrs[k:])]

    query_rounds = []
    for q in range(len(indices)):
        initial = FriInitialTreeProof(
            [rows[q] for rows in oracle_rows],
            [paths[q] for paths in oracle_paths])
        steps = []
        for arity, rows, paths in step_data:
            row = rows[q]
            evals = np.stack([row[:arity], row[arity:]], axis=1)  # (arity, 2)
            steps.append(FriQueryStep(evals=evals, merkle_proof=paths[q]))
        query_rounds.append(FriQueryRound(initial, steps))
    return query_rounds
