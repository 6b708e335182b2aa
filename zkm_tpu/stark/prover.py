"""Multi-table STARK prover.

Reference: /root/reference/prover/src/prover.rs (SURVEY.md §3.2).  The
transcript discipline is mirrored exactly: one challenger for the whole
AllProof; order = all trace caps -> public values -> CTL challenge set ->
per table (in table order): compact state -> aux cap -> alphas -> quotient
cap -> zeta -> openings -> FRI.

TPU-first details:
  * quotient constraints evaluate over the whole 2n-point coset at once
    (BatchAlgebra; the reference steps by SIMD lanes);
  * Z_H on the coset takes only two values (g^n·(-1)^i - 1), so the
    divisions become two constant inversions;
  * aux/trace quotient-domain values come from rate-1-bit coset NTTs of the
    committed coefficients.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field import extension as gl2
from ..field import ntt
from ..commit import polynomial_batch as pb
from ..fri import oracle as fri_oracle
from ..iop.challenger import Challenger
from .algebra import BatchAlgebra, BatchRows
from .config import StarkConfig
from .constraint_consumer import ConstraintConsumer
from .cross_table_lookup import (CtlCheckVars, GrandProductChallenge,
                                 cross_table_lookup_data,
                                 get_grand_product_challenge_set)
from .lookup import lookup_helper_columns
from .proof import (AllProof, PublicValues, StarkOpeningSet, StarkProof,
                    StarkProofWithMetadata)
from .vanishing_poly import eval_vanishing_scheduled
from ..utils.timing import log, timed

P = gl.P


def observe_public_values(challenger: Challenger, pv: PublicValues):
    challenger.observe_elements(pv.roots_before.root)
    challenger.observe_elements(pv.roots_after.root)
    challenger.observe_elements(list(pv.userdata))


def public_inputs_of(stark, pv: PublicValues) -> tuple:
    """The per-table public-input scalars selected from the proof claim."""
    if not stark.num_public_inputs:
        return ()
    return tuple(stark.public_inputs(
        [int(v) for v in pv.roots_before.root],
        [int(v) for v in pv.roots_after.root],
        [int(b) for b in pv.userdata]))


@lru_cache(maxsize=None)
def _quotient_xs(degree_bits: int):
    """x_i = g * w^i over the 2n coset (numpy u32 pair)."""
    log_m = degree_bits + 1
    w = gl.primitive_root_of_unity(log_m)
    pw = gl.host_powers(w, 1 << log_m).astype(object)
    vals = (pw * gl.GENERATOR) % P
    arr = vals.astype(np.uint64)
    return ((arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (arr >> np.uint64(32)).astype(np.uint32))


def _const(v: int) -> gl.Gf:
    return gl.full((), v % P)


def _roll_rows(x: gl.Gf, k: int) -> gl.Gf:
    """Cyclic next-row view: column c of the result is column (c+k) mod M.

    Implemented as slice+concat, NOT a modular gather: a wrap-around gather
    fused into the large scheduled-constraint graph miscompiles on XLA:CPU
    (wrong values at exactly the wrap row; observed under the 8-virtual-
    device test platform).  Slices also lower better on TPU."""
    return (jnp.concatenate([x[0][..., k:], x[0][..., :k]], axis=-1),
            jnp.concatenate([x[1][..., k:], x[1][..., :k]], axis=-1))


def ctl_structure_of(ctl_data, chal_index) -> tuple:
    """Static description of a table's CTL aux layout.

    chal_index maps a GrandProductChallenge (int form) to its index in the
    traced challenge list."""
    return tuple(
        (len(z.helper_columns), chal_index[(z.challenge.beta,
                                            z.challenge.gamma)],
         tuple(tuple(c) for c in z.columns), tuple(z.filters))
        for z in ctl_data.zs_columns)


@lru_cache(maxsize=None)
def _quotient_domain_tables(degree_bits: int):
    """Challenge-independent per-point tables over the 2n quotient coset:
    (z_last, lagrange_first, lagrange_last, inv_zh) — computed once per
    size, outside the big constraint graph."""
    n = 1 << degree_bits
    m = 2 * n

    @jax.jit
    def build():
        xs = _quotient_xs(degree_bits)
        g_last = gl.host_pow(gl.primitive_root_of_unity(degree_bits), n - 1)
        z_last = gl.sub(xs, _const(g_last))
        # Z_H(x) on the coset: g^n * (-1)^i - 1 (two values only)
        gn = gl.host_pow(gl.GENERATOR, n)
        even_i = jnp.asarray(np.arange(m) % 2 == 0)
        zh_even, zh_odd = (gn - 1) % P, (-gn - 1) % P
        z_h = gl.select(even_i, _const(zh_even), _const(zh_odd))
        inv_zh = gl.select(even_i, _const(gl.host_inv(zh_even)),
                           _const(gl.host_inv(zh_odd)))
        n_inv = gl.host_inv(n)
        lag_first = gl.mul(gl.mul(z_h, _const(n_inv)),
                           gl.inverse(gl.sub(xs, _const(1))))
        lag_last = gl.mul(gl.mul(z_h, _const((n_inv * g_last) % P)),
                          gl.inverse(gl.sub(xs, _const(g_last))))
        return z_last, lag_first, lag_last, inv_zh

    return jax.block_until_ready(build())


@partial(jax.jit, static_argnums=(0, 1, 5, 6))
def _quotient_core(stark, degree_bits: int, trace_coeffs: gl.Gf,
                   aux_coeffs, alphas_gf, num_lookup: int,
                   ctl_structure, chal_gfs, domain_tables,
                   lde_a, pub_gfs=()) -> List[gl.Gf]:
    """Evaluate the alpha-combined vanishing polynomial / Z_H over the
    quotient coset (size 2n).  Returns one (2n,) array per alpha.

    Challenge and alpha values are traced (no per-proof recompilation)."""
    n = 1 << degree_bits
    m = 2 * n
    algebra = BatchAlgebra(m)

    trace_qd = ntt.lde(trace_coeffs, 1, aux=lde_a)    # (C, 2n) on g*H_2n
    full = trace_qd
    if aux_coeffs is not None:
        aux_qd = ntt.lde(aux_coeffs, 1, aux=lde_a)
        full = (jnp.concatenate([trace_qd[0], aux_qd[0]], axis=0),
                jnp.concatenate([trace_qd[1], aux_qd[1]], axis=0))
    full_next = _roll_rows(full, 2)

    z_last, lag_first, lag_last, inv_zh = domain_tables
    consumer = ConstraintConsumer(
        algebra, list(alphas_gf), z_last, lag_first, lag_last)
    eval_vanishing_scheduled(stark, num_lookup, ctl_structure, full,
                             full_next, chal_gfs, consumer, pub_gfs)
    return [gl.mul(acc, inv_zh) for acc in consumer.accs]


@partial(jax.jit, static_argnums=(0, 1, 5, 6))
def _check_constraints_core(stark, degree_bits: int, trace_values: gl.Gf,
                            aux_values, alphas_gf, num_lookup: int,
                            ctl_structure, chal_gfs,
                            pub_gfs=()) -> List[gl.Gf]:
    """Evaluate all constraints *on H itself* (reference `check_constraints`,
    prover.rs:793-910): row selectors become indicator vectors; every
    accumulator row must come out zero."""
    n = 1 << degree_bits
    algebra = BatchAlgebra(n)
    full = trace_values
    if aux_values is not None:
        full = (jnp.concatenate([trace_values[0], aux_values[0]], axis=0),
                jnp.concatenate([trace_values[1], aux_values[1]], axis=0))
    full_next = _roll_rows(full, 1)

    g = gl.primitive_root_of_unity(degree_bits)
    xs = gl.from_u64(gl.host_powers(g, n))
    g_last = gl.host_pow(g, n - 1)
    z_last = gl.sub(xs, _const(g_last))
    first = np.zeros(n, dtype=np.uint64)
    first[0] = 1
    last = np.zeros(n, dtype=np.uint64)
    last[-1] = 1
    consumer = ConstraintConsumer(
        algebra, list(alphas_gf), z_last,
        gl.from_u64(first), gl.from_u64(last))

    eval_vanishing_scheduled(stark, num_lookup, ctl_structure, full,
                             full_next, chal_gfs, consumer, pub_gfs)
    return consumer.accs


def check_constraints(stark, trace_values, aux_values, alphas, num_lookup,
                      ctl_structure, chal_gfs, degree_bits, pub_gfs=()):
    accs = _check_constraints_core(
        stark, degree_bits, trace_values, aux_values,
        [_const(a) for a in alphas], num_lookup, ctl_structure, chal_gfs,
        pub_gfs)
    for i, acc in enumerate(accs):
        vals = gl.to_u64(acc)
        bad = np.nonzero(vals)[0]
        assert bad.size == 0, \
            f"constraints failed for alpha {i} at rows {bad[:10].tolist()}"


@partial(jax.jit, static_argnums=(1,))
def _quotient_coeffs(quotient_values: List[gl.Gf], n: int,
                     cintt_a) -> List[gl.Gf]:
    return [ntt.coset_intt(gl.reshape(qv, (1, 2 * n)), aux=cintt_a)
            for qv in quotient_values]


def _quotient_chunks(quotient_values: List[gl.Gf], n: int) -> gl.Gf:
    """Coset values (2n) -> coefficients -> two degree-n chunks each,
    challenge-major order (matches the committed quotient layout).  The
    final stack happens outside jit on materialized arrays (concat of deep
    producers hangs XLA CPU's LLVM — see project memory)."""
    log_m = (2 * n).bit_length() - 1
    coeffs = _quotient_coeffs(quotient_values, n,
                              ntt.coset_aux(log_m, inverse=True))
    chunks_lo, chunks_hi = [], []
    for lo, hi in coeffs:
        chunks_lo += [lo[0, :n], lo[0, n:]]
        chunks_hi += [hi[0, :n], hi[0, n:]]
    return jnp.stack(chunks_lo), jnp.stack(chunks_hi)


def prove_single_table(stark, config: StarkConfig, trace_values: gl.Gf,
                       trace_commitment: pb.PolynomialBatch, ctl_data,
                       ctl_challenges, challenger: Challenger,
                       debug: bool = False,
                       publics=()) -> StarkProofWithMetadata:
    n = trace_values[0].shape[-1]
    degree_bits = n.bit_length() - 1
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height

    init_challenger_state = challenger.compact()

    lookup_challenges = None
    if stark.uses_lookups():
        lookup_challenges = [ch.beta for ch in ctl_challenges.challenges]

    with timed("aux polys", table=type(stark).__name__):
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
    challenger.observe_cap(aux_commitment.cap_u64())

    alphas = challenger.get_n_challenges(config.num_challenges)

    chal_index = {(c.beta, c.gamma): i
                  for i, c in enumerate(ctl_challenges.challenges)}
    chal_gfs = [(gl.full((), c.beta), gl.full((), c.gamma))
                for c in ctl_challenges.challenges]
    ctl_structure = ctl_structure_of(ctl_data, chal_index)
    alphas_gf = [_const(a) for a in alphas]
    pub_gfs = tuple(_const(p) for p in publics)

    if debug:
        with timed("check_constraints", table=type(stark).__name__):
            check_constraints(stark, trace_values, aux_values, alphas,
                              num_lookup_columns, ctl_structure, chal_gfs,
                              degree_bits, pub_gfs)

    with timed("quotient eval", table=type(stark).__name__, n=n):
        quotient_values = _quotient_core(
            stark, degree_bits, trace_commitment.coeffs,
            aux_commitment.coeffs, alphas_gf, num_lookup_columns,
            ctl_structure, chal_gfs, _quotient_domain_tables(degree_bits),
            ntt.lde_aux(degree_bits, 1), pub_gfs)
        quotient_values[0][0].block_until_ready()

    with timed("quotient commit"):
        quotient_chunks = _quotient_chunks(quotient_values, n)
        quotient_commitment = pb.from_coeffs(quotient_chunks, rate_bits,
                                             cap_height)
    challenger.observe_cap(quotient_commitment.cap_u64())

    zeta = challenger.get_extension_challenge()
    # zeta must lie outside H (otherwise Z_H(zeta) = 0)
    zn = gl2.host_pow(zeta, n)
    assert zn != (1, 0), "opening point is in the subgroup"

    g = gl.primitive_root_of_unity(degree_bits)
    zeta_next = gl2.host_mul(zeta, (g, 0))

    with timed("openings eval", table=type(stark).__name__):
        # all 5 opening sets + the at-1 coefficient sums (openings at the
        # point 1, base field) fetched in ONE device->host round trip
        (local_values, next_values, aux_open, aux_open_next,
         quotient_open, aux_at_one) = fri_oracle.eval_columns_at_many(
             [(trace_commitment.coeffs, zeta),
              (trace_commitment.coeffs, zeta_next),
              (aux_commitment.coeffs, zeta),
              (aux_commitment.coeffs, zeta_next),
              (quotient_commitment.coeffs, zeta)],
             extra=[gl.sum_axis(aux_commitment.coeffs, -1)])
    total_helpers = sum(ctl_data.num_ctl_helper_polys())
    ctl_zs_first = aux_at_one[num_lookup_columns + total_helpers:]

    openings = StarkOpeningSet(
        local_values=local_values, next_values=next_values,
        auxiliary_polys=aux_open, auxiliary_polys_next=aux_open_next,
        ctl_zs_first=ctl_zs_first, quotient_polys=quotient_open)

    for batch_vals in openings.fri_batches():
        for c0, c1 in batch_vals:
            challenger.observe_extension((int(c0), int(c1)))

    num_columns = trace_commitment.coeffs[0].shape[0]
    num_aux = aux_commitment.coeffs[0].shape[0]
    num_quot = quotient_commitment.coeffs[0].shape[0]
    batches = [
        fri_oracle.OpeningBatch(point=zeta, ranges=(
            fri_oracle.PolyRange(0, 0, num_columns),
            fri_oracle.PolyRange(1, 0, num_aux),
            fri_oracle.PolyRange(2, 0, num_quot))),
        fri_oracle.OpeningBatch(point=zeta_next, ranges=(
            fri_oracle.PolyRange(0, 0, num_columns),
            fri_oracle.PolyRange(1, 0, num_aux))),
        fri_oracle.OpeningBatch(point=(1, 0), ranges=(
            fri_oracle.PolyRange(1, num_lookup_columns + total_helpers,
                                 num_aux),)),
    ]
    opening_values = openings.fri_batches()
    oracles = [trace_commitment, aux_commitment, quotient_commitment]
    with timed("fri openings", table=type(stark).__name__):
        opening_proof = fri_oracle.open_and_prove(
            batches, opening_values, oracles, challenger, config.fri_config)

    proof = StarkProof(
        trace_cap=trace_commitment.cap_u64(),
        auxiliary_polys_cap=aux_commitment.cap_u64(),
        quotient_polys_cap=quotient_commitment.cap_u64(),
        openings=openings, opening_proof=opening_proof)
    return StarkProofWithMetadata(
        init_challenger_state=init_challenger_state, proof=proof,
        degree_bits=degree_bits)


def prove_with_traces(starks: Sequence, config: StarkConfig,
                      traces: List[gl.Gf], ctls,
                      public_values: PublicValues,
                      debug: bool = False, mesh=None) -> AllProof:
    """traces[t]: (C_t, N_t) per-table trace values.

    mesh: optional 1-d jax.sharding.Mesh with axis "tp".  Trace rows (the
    power-of-two N axis, always tp-divisible) are sharded over it; GSPMD
    propagates the sharding through the whole production pipeline — commit
    iNTT/LDE (butterfly exchanges become collectives), Merkle leaf hashing
    (pointwise over the sharded rows), quotient eval over the coset, and
    the real FRI fold with its 1/x term.  The math is exact integer field
    ops, so the proof is bit-identical to the single-device one (SURVEY
    §2.7 mapping; tested in tests/test_multichip.py and the driver
    dryrun).  Segment-level dp = independent proofs on disjoint
    submeshes."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P
        sh = NamedSharding(mesh, _P(None, "tp"))
        traces = [tuple(jax.device_put(c, sh) for c in t) for t in traces]
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height

    with timed("trace commits", tables=len(traces)):
        trace_commitments = [pb.from_values(t, rate_bits, cap_height)
                             for t in traces]
        # fetch all caps in one round trip (observation order is fixed by
        # the transcript, but the transfers are independent)
        caps_u64 = gl.to_u64_many([c.tree.cap for c in trace_commitments])
    challenger = Challenger()
    for cap in caps_u64:
        challenger.observe_cap(cap)
    observe_public_values(challenger, public_values)

    ctl_challenges = get_grand_product_challenge_set(
        challenger, config.num_challenges)
    with timed("ctl data"):
        ctl_data_per_table = cross_table_lookup_data(
            traces, ctls, ctl_challenges, 3)

    proofs = []
    device_transcript = _use_device_transcript() and not debug
    if device_transcript:
        from .device_transcript import (TranscriptHandle,
                                        prove_single_table_device)
        handle = TranscriptHandle.from_host(challenger)
    for i, (stark, trace, commitment, ctl_data) in enumerate(zip(
            starks, traces, trace_commitments, ctl_data_per_table)):
        with timed("prove table", table=type(stark).__name__,
                   n=trace[0].shape[-1]):
            if device_transcript:
                proofs.append(prove_single_table_device(
                    stark, config, trace, commitment, ctl_data,
                    ctl_challenges, handle,
                    publics=public_inputs_of(stark, public_values)))
            else:
                proofs.append(prove_single_table(
                    stark, config, trace, commitment, ctl_data,
                    ctl_challenges, challenger, debug=debug,
                    publics=public_inputs_of(stark, public_values)))
        # this table's trace commitment (LDE leaves + tree) and raw trace
        # are dead once its proof is assembled; free them so the device
        # allocator reclaims the memory before the next table commits its
        # aux/quotient oracles (peak-HBM reduction; see release())
        commitment.release()
        traces[i] = None
        ctl_data_per_table[i] = None
    if device_transcript:
        # hand the final transcript state back to the caller's challenger
        final = handle.fetch_host_with([])[0]
        challenger.state = final.state
        challenger.input_buffer = final.input_buffer
        challenger.output_buffer = final.output_buffer
    return AllProof(stark_proofs=proofs, ctl_challenges=ctl_challenges,
                    public_values=public_values)


def _use_device_transcript() -> bool:
    """Device-resident transcript (stark/device_transcript.py): default ON
    for accelerator backends (fetch latency dominates there), OFF for CPU
    (XLA:CPU prefers many small graphs; the host path is also the
    reference implementation the suite exercises).  ZKM_DEVICE_TRANSCRIPT
    overrides either way."""
    import os
    flag = os.environ.get("ZKM_DEVICE_TRANSCRIPT")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() != "cpu"
