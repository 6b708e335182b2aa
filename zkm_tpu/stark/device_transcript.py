"""Device-resident Fiat-Shamir transcript: the per-table prove with
(almost) no host round trips.

Motivation (measured on the axon remote-TPU tunnel, BASELINE.md): a
dispatch is free (async enqueue, ~0 ms) while a device->host fetch is a
full round trip — 125 ms idle, MULTI-SECOND under host CPU load.  The
host-challenger prover pays a fetch per transcript step (caps, openings,
FRI layer caps, final poly): ~10 per table, ~60 per proof.  Here the
challenger state lives on device (iop.device_challenger), every
observe/draw happens inside a jitted step, and a table's proof data comes
back in ONE batched fetch right before the proof-of-work grind (the only
transcript step that genuinely needs the host loop).

Per table: 1 batched fetch (+ the PoW grind's own result reads) instead
of ~10.  The math kernels are the SAME jits the host-transcript path uses
(quotient core, batch opening quotient, fold chain, Merkle builds), so
proofs are bit-identical — asserted by
tests/test_device_transcript_prover.py.

Reference analog: prover.rs:441-641 (prove_single_table) — same
transcript discipline, reordered onto the device clock.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import numpy as np

from ..field import goldilocks as gl
from ..field import extension as gl2
from ..field import ntt
from ..commit import polynomial_batch as pb
from ..commit.merkle import MerkleTree
from ..fri import oracle as fri_oracle
from ..fri.prover import (_chunk_and_tree, _fold_full, extract_query_rounds,
                          fri_proof_of_work)
from ..fri.proof import FriProof
from ..iop.challenger import Challenger
from ..iop.device_challenger import RATE, DeviceChallenger
from ..utils.timing import timed
from .config import StarkConfig
from .proof import StarkOpeningSet, StarkProof, StarkProofWithMetadata

P = gl.P


# ---------------------------------------------------------------------------
# Transcript handle: host bookkeeping for a device-resident challenger.
# ---------------------------------------------------------------------------

class LengthSim:
    """Mirror of the challenger's buffer-LENGTH dynamics (spec evolution
    across jitted steps; values never touch the host)."""

    def __init__(self, n_in: int, n_out: int):
        self.n_in, self.n_out = n_in, n_out

    def observe(self, k: int):
        for _ in range(k):
            self.n_out = 0
            self.n_in += 1
            if self.n_in == RATE:
                self.n_in, self.n_out = 0, RATE

    def draw(self, k: int):
        for _ in range(k):
            if self.n_in or not self.n_out:
                self.n_in, self.n_out = 0, RATE
            self.n_out -= 1

    def compact(self):
        self.n_in, self.n_out = 0, 0

    @property
    def spec(self):
        return (self.n_in, self.n_out)


@partial(jax.jit, static_argnums=(0, 3))
def _observe_draw_step(spec, arrays, values: gl.Gf, n_draws: int):
    """Observe values[0..T) then draw n challenges — one dispatch."""
    ch = DeviceChallenger.unflatten(spec, arrays)
    for i in range(values[0].shape[0]):
        ch.observe_element(gl.getitem(values, i))
    draws = ch.get_n_challenges(n_draws)
    _, out = ch.flatten()
    if draws:
        stacked = gl.concatenate([gl.reshape(d, (1,)) for d in draws])
    else:
        stacked = gl.zeros((0,))
    return out, stacked


@partial(jax.jit, static_argnums=(0,))
def _compact_step(spec, arrays):
    ch = DeviceChallenger.unflatten(spec, arrays)
    state = ch.compact()
    _, out = ch.flatten()
    return out, state


class TranscriptHandle:
    """(spec, device arrays) pair with challenger ops as single dispatches."""

    def __init__(self, spec, arrays):
        self.spec = spec
        self.arrays = arrays

    @classmethod
    def from_host(cls, ch: Challenger) -> "TranscriptHandle":
        spec, arrays = DeviceChallenger.from_host(ch).flatten()
        return cls(spec, arrays)

    def observe_and_draw(self, values: Optional[gl.Gf], n: int = 0) -> gl.Gf:
        """values: flat (T,) device elements (None = draw only).
        Returns (n,) drawn challenges (device)."""
        if values is None:
            values = gl.zeros((0,))
        sim = LengthSim(*self.spec)
        sim.observe(values[0].shape[0])
        sim.draw(n)
        self.arrays, draws = _observe_draw_step(
            self.spec, self.arrays, values, n)
        self.spec = sim.spec
        return draws

    def draw_ext(self) -> gl2.Gf2:
        d = self.observe_and_draw(None, 2)
        return (gl.getitem(d, 0), gl.getitem(d, 1))

    def compact(self) -> gl.Gf:
        sim = LengthSim(*self.spec)
        sim.compact()
        self.arrays, state = _compact_step(self.spec, self.arrays)
        self.spec = sim.spec
        return state

    def fetch_host_with(self, extras: Sequence) -> tuple:
        """ONE device->host round trip: challenger (as a host Challenger)
        plus every extra device value, returned as u64 arrays."""
        state, bufs = self.arrays
        vals = gl.to_u64_many([state, bufs] + list(extras))
        ch = Challenger(list(vals[0]))
        n_in = self.spec[0]
        ch.input_buffer = [int(v) for v in vals[1][:n_in]]
        ch.output_buffer = [int(v) for v in vals[1][n_in:]]
        return ch, vals[2:]


# ---------------------------------------------------------------------------
# Device-transcript per-table prove.
# ---------------------------------------------------------------------------

def _flat_ext(pairs: gl2.Gf2) -> gl.Gf:
    """(k,) ext -> (2k,) base elements in observe order [c0_i, c1_i]."""
    k = pairs[0][0].shape[0]
    stacked = gl.stack([pairs[0], pairs[1]], axis=1)   # (k, 2)
    return gl.reshape(stacked, (2 * k,))


def prove_single_table_device(stark, config: StarkConfig,
                              trace_values: gl.Gf,
                              trace_commitment: pb.PolynomialBatch,
                              ctl_data, ctl_challenges,
                              handle: TranscriptHandle,
                              publics=()) -> StarkProofWithMetadata:
    """Bit-identical to prover.prove_single_table, transcript on device."""
    from . import prover as hp   # shared jitted kernels

    n = trace_values[0].shape[-1]
    degree_bits = n.bit_length() - 1
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height

    init_state_dev = handle.compact()

    lookup_challenges = None
    if stark.uses_lookups():
        lookup_challenges = [ch.beta for ch in ctl_challenges.challenges]

    with timed("aux polys", table=type(stark).__name__):
        from .lookup import lookup_helper_columns
        import jax.numpy as jnp
        aux_polys: List[gl.Gf] = []
        num_lookup_columns = 0
        if lookup_challenges is not None:
            for lookup in stark.lookups():
                for challenge in lookup_challenges:
                    aux_polys.extend(lookup_helper_columns(
                        lookup, trace_values, challenge,
                        stark.constraint_degree))
            num_lookup_columns = len(aux_polys)
        aux_polys.extend(ctl_data.ctl_helper_polys())
        aux_polys.extend(ctl_data.ctl_z_polys())
        assert aux_polys, "No CTL?"
        aux_values = (jnp.stack([p[0] for p in aux_polys]),
                      jnp.stack([p[1] for p in aux_polys]))
    with timed("aux commit", polys=len(aux_polys)):
        aux_commitment = pb.from_values(aux_values, rate_bits, cap_height)

    # observe aux cap + draw alphas — one dispatch, no fetch
    alphas_flat = handle.observe_and_draw(
        gl.reshape(aux_commitment.tree.cap, (4 * (1 << cap_height),)),
        config.num_challenges)
    alphas_gf = [gl.getitem(alphas_flat, i)
                 for i in range(config.num_challenges)]

    chal_index = {(c.beta, c.gamma): i
                  for i, c in enumerate(ctl_challenges.challenges)}
    chal_gfs = [(gl.full((), c.beta), gl.full((), c.gamma))
                for c in ctl_challenges.challenges]
    ctl_structure = hp.ctl_structure_of(ctl_data, chal_index)
    pub_gfs = tuple(hp._const(p) for p in publics)

    with timed("quotient eval", table=type(stark).__name__, n=n):
        quotient_values = hp._quotient_core(
            stark, degree_bits, trace_commitment.coeffs,
            aux_commitment.coeffs, alphas_gf, num_lookup_columns,
            ctl_structure, chal_gfs,
            hp._quotient_domain_tables(degree_bits),
            ntt.lde_aux(degree_bits, 1), pub_gfs)

    with timed("quotient commit"):
        quotient_chunks = hp._quotient_chunks(quotient_values, n)
        quotient_commitment = pb.from_coeffs(quotient_chunks, rate_bits,
                                             cap_height)

    # observe quotient cap + draw zeta
    zeta_flat = handle.observe_and_draw(
        gl.reshape(quotient_commitment.tree.cap, (4 * (1 << cap_height),)),
        2)
    zeta = (gl.getitem(zeta_flat, 0), gl.getitem(zeta_flat, 1))
    g = gl.primitive_root_of_unity(degree_bits)
    zeta_next = gl2.mul(zeta, gl2.scalar_from_u64s(g, 0))

    with timed("openings eval", table=type(stark).__name__):
        local_values = fri_oracle._eval_columns_core(
            trace_commitment.coeffs, zeta)
        next_values = fri_oracle._eval_columns_core(
            trace_commitment.coeffs, zeta_next)
        aux_open = fri_oracle._eval_columns_core(
            aux_commitment.coeffs, zeta)
        aux_open_next = fri_oracle._eval_columns_core(
            aux_commitment.coeffs, zeta_next)
        quotient_open = fri_oracle._eval_columns_core(
            quotient_commitment.coeffs, zeta)
        # openings at the point 1 (base field) = sums of coefficients
        aux_at_one = gl.sum_axis(aux_commitment.coeffs, -1)

    total_helpers = sum(ctl_data.num_ctl_helper_polys())
    num_aux = aux_commitment.coeffs[0].shape[0]
    zs_start = num_lookup_columns + total_helpers
    ctl_zs_first = gl.getitem(aux_at_one, slice(zs_start, num_aux))
    zk = num_aux - zs_start

    # observe every opening in fri_batches order, then draw the FRI alpha
    zeta_batch = (gl.concatenate([local_values[0], aux_open[0],
                                  quotient_open[0]]),
                  gl.concatenate([local_values[1], aux_open[1],
                                  quotient_open[1]]))
    znext_batch = (gl.concatenate([next_values[0], aux_open_next[0]]),
                   gl.concatenate([next_values[1], aux_open_next[1]]))
    one_batch = (ctl_zs_first, gl.zeros((zk,)))
    obs = gl.concatenate([_flat_ext(zeta_batch), _flat_ext(znext_batch),
                          _flat_ext(one_batch)])
    alpha = handle.observe_and_draw(obs, 2)
    alpha2 = (gl.getitem(alpha, 0), gl.getitem(alpha, 1))

    num_columns = trace_commitment.coeffs[0].shape[0]
    num_quot = quotient_commitment.coeffs[0].shape[0]
    ranges_per_batch = [
        (fri_oracle.PolyRange(0, 0, num_columns),
         fri_oracle.PolyRange(1, 0, num_aux),
         fri_oracle.PolyRange(2, 0, num_quot)),
        (fri_oracle.PolyRange(0, 0, num_columns),
         fri_oracle.PolyRange(1, 0, num_aux)),
        (fri_oracle.PolyRange(1, zs_start, num_aux),),
    ]
    points = [zeta, zeta_next,
              gl2.scalar_from_u64s(1, 0)]
    batch_values = [zeta_batch, znext_batch, one_batch]
    oracles = [trace_commitment, aux_commitment, quotient_commitment]

    with timed("fri openings", table=type(stark).__name__):
        proof_parts = _open_and_fri_device(
            ranges_per_batch, points, batch_values, oracles, alpha2,
            degree_bits, handle, config)

    (caps_dev, final_c_dev, tails_dev, trees, arities, log_m) = proof_parts

    # ---- the ONE batched fetch: challenger + all proof components ----------
    extras = ([init_state_dev,
               trace_commitment.tree.cap, aux_commitment.tree.cap,
               quotient_commitment.tree.cap,
               local_values, next_values, aux_open, aux_open_next,
               quotient_open, ctl_zs_first]
              + list(caps_dev) + list(final_c_dev) + list(tails_dev))
    with timed("proof fetch", table=type(stark).__name__):
        host_ch, vals = handle.fetch_host_with(_ext_split(extras))
    out = _ExtJoin(vals)

    init_challenger_state = [int(v) for v in out.base()]
    trace_cap = out.base()
    aux_cap = out.base()
    quotient_cap = out.base()
    lv = out.ext()
    nv = out.ext()
    ao = out.ext()
    aon = out.ext()
    qo = out.ext()
    zf = out.base()
    caps = [out.base() for _ in caps_dev]
    f0, f1 = out.base(), out.base()
    t0, t1 = out.base(), out.base()
    assert not t0.any() and not t1.any(), "final poly not low-degree"

    openings = StarkOpeningSet(
        local_values=lv, next_values=nv, auxiliary_polys=ao,
        auxiliary_polys_next=aon, ctl_zs_first=zf, quotient_polys=qo)
    final_poly = np.stack([f0, f1], axis=1)

    # ---- PoW grind + queries (host transcript, state now known) ------------
    with timed("fri pow+queries", table=type(stark).__name__):
        pow_witness = fri_proof_of_work(host_ch, config.fri_config)
        host_ch.observe_element(pow_witness)
        response = host_ch.get_challenge()
        assert response >> (64 - config.fri_config.proof_of_work_bits) == 0
        lde_size = 1 << (degree_bits + config.fri_config.rate_bits)
        indices = [host_ch.get_challenge() % lde_size
                   for _ in range(config.fri_config.num_query_rounds)]
        query_rounds = extract_query_rounds(oracles, trees, arities,
                                            indices)

    # re-seat the device transcript for the next table
    reseated = TranscriptHandle.from_host(host_ch)
    handle.spec, handle.arrays = reseated.spec, reseated.arrays

    opening_proof = FriProof(commit_phase_merkle_caps=caps,
                             query_round_proofs=query_rounds,
                             final_poly=final_poly,
                             pow_witness=pow_witness)
    proof = StarkProof(
        trace_cap=trace_cap, auxiliary_polys_cap=aux_cap,
        quotient_polys_cap=quotient_cap, openings=openings,
        opening_proof=opening_proof)
    return StarkProofWithMetadata(
        init_challenger_state=init_challenger_state, proof=proof,
        degree_bits=degree_bits)


def _ext_split(items):
    """Flatten a mixed list of gl.Gf / gl2.Gf2 into gl.Gf values for
    to_u64_many, remembering the structure for _ExtJoin."""
    flat = []
    for it in items:
        if _is_ext(it):
            flat.append(it[0])
            flat.append(it[1])
        else:
            flat.append(it)
    return flat


def _is_ext(it) -> bool:
    """gl2.Gf2 = ((lo,hi),(lo,hi)); gl.Gf = (lo,hi) of ndarray."""
    return isinstance(it, tuple) and len(it) == 2 \
        and isinstance(it[0], tuple)


class _ExtJoin:
    """Sequential reader over the fetched u64 arrays."""

    def __init__(self, vals):
        self.vals = list(vals)
        self.i = 0

    def base(self) -> np.ndarray:
        v = self.vals[self.i]
        self.i += 1
        return v

    def ext(self) -> np.ndarray:
        c0 = self.base()
        c1 = self.base()
        return np.stack([c0, c1], axis=-1)


def _open_and_fri_device(ranges_per_batch, points, batch_values, oracles,
                         alpha: gl2.Gf2, degree_bits: int,
                         handle: TranscriptHandle, config: StarkConfig):
    """Device-side openings->FRI: the open_and_prove + fri_prove pair with
    every transcript step on device.  Returns device proof components plus
    the trees needed for query extraction."""
    fc = config.fri_config
    log_m = degree_bits + fc.rate_bits
    xs = fri_oracle.lde_points_bitrev(log_m, gl.GENERATOR)
    import jax.numpy as jnp
    xs_dev = (jnp.asarray(xs[0]), jnp.asarray(xs[1]))
    oracle_leaves = tuple(o.leaves for o in oracles)

    final = None
    for ranges, point, opens in zip(ranges_per_batch, points, batch_values):
        num_polys = sum(r.stop - r.start for r in ranges)
        ap = fri_oracle._ext_powers_device(alpha, max(1, num_polys))
        # comp(z) = sum_i alpha^i * opens_i (opens: (k,) ext on device)
        opens2 = (opens[0], opens[1])
        cz = gl2.sum_axis(gl2.mul(ap, opens2), axis=-1) \
            if num_polys else gl2.zeros(())
        quot = fri_oracle._batch_quotient_core(
            ranges, oracle_leaves, ap, cz, point, xs_dev)
        if final is None:
            final = quot
        else:
            shift = gl2.pow_const(alpha, num_polys)
            final = fri_oracle._shift_accumulate(final, shift, quot)

    # FRI commit-fold chain with device transcript
    shift = gl.GENERATOR
    arities = fc.reduction_arity_bits(degree_bits)
    values = final
    trees = []
    caps_dev = []
    cur_log_m = log_m
    for arity_bits in arities:
        arity = 1 << arity_bits
        leaves, levels = _chunk_and_tree(values, arity, fc.cap_height)
        tree = MerkleTree(levels=levels, cap_height=fc.cap_height)
        trees.append((tree, leaves))
        caps_dev.append(tree.cap)
        beta_flat = handle.observe_and_draw(
            gl.reshape(tree.cap, (4 * (1 << fc.cap_height),)), 2)
        b = (gl.getitem(beta_flat, 0), gl.getitem(beta_flat, 1))
        values = _fold_full(values, b, arity_bits, cur_log_m, shift)
        for _ in range(arity_bits):
            cur_log_m -= 1
            shift = gl.host_mul(shift, shift)

    rev = ntt.bit_reverse_indices(cur_log_m)
    vals_nat = gl2.take(values, rev, axis=0)
    final_coeffs = (ntt.coset_intt(vals_nat[0], shift),
                    ntt.coset_intt(vals_nat[1], shift))
    fdeg = 1 << (degree_bits - sum(arities))
    c0 = gl.getitem(final_coeffs[0], slice(0, fdeg))
    c1 = gl.getitem(final_coeffs[1], slice(0, fdeg))
    tails = (gl.getitem(final_coeffs[0], slice(fdeg, None)),
             gl.getitem(final_coeffs[1], slice(fdeg, None)))
    # observe the final polynomial (ext coefficients in order)
    handle.observe_and_draw(_flat_ext((c0, c1)), 0)

    return caps_dev, (c0, c1), tails, trees, arities, cur_log_m
