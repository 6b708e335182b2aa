"""Batched polynomial openings -> FRI: the prove_openings / combine_initial pair.

Reference analog: plonky2 `PolynomialBatch::prove_openings` (prover) and
`fri_combine_initial` (verifier); SURVEY.md §8 "Aux-poly commitment layout" /
quotient batching.

The combined FRI input polynomial is built in *value space* over the LDE
domain:  for each opening batch (point z, polynomial set S):
    comp(x)   = sum_i alpha^i p_i(x)          (x over the bit-reversed LDE)
    quotient  = (comp(x) - comp(z)) / (x - z)  (batched field inverse)
and batches accumulate as  final = final * alpha^{|S|} + quotient  — exactly
the reference's ReducingFactor shift discipline, so the verifier's
per-query combine matches term for term.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field import extension as gl2
from ..field import ntt
from ..commit.polynomial_batch import PolynomialBatch
from ..iop.challenger import Challenger
from .config import FriConfig
from .prover import fri_prove
from .proof import FriProof
from .verifier import verify_fri_proof

Ext = Tuple[int, int]


@dataclass(frozen=True)
class PolyRange:
    """A contiguous range of polynomials within one oracle."""
    oracle: int
    start: int
    stop: int

    @property
    def count(self) -> int:
        return self.stop - self.start


@dataclass(frozen=True)
class OpeningBatch:
    point: Ext
    ranges: Tuple[PolyRange, ...]

    @property
    def num_polys(self) -> int:
        return sum(r.count for r in self.ranges)


@lru_cache(maxsize=None)
def lde_points_bitrev(log_m: int, shift: int) -> gl.Gf:
    """x_m = shift * w^{rev(m)} over the LDE domain, bit-reversed order.

    Host-computed numpy constants (trace-safe)."""
    w = gl.primitive_root_of_unity(log_m)
    pows = gl.host_powers(w, 1 << log_m)
    rev = ntt.bit_reverse_indices(log_m)
    vals = (pows[rev].astype(object) * shift) % gl.P
    arr = vals.astype(np.uint64)
    return ((arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (arr >> np.uint64(32)).astype(np.uint32))


def _alpha_powers_host(alpha: Ext, n: int) -> List[Ext]:
    out = [(1, 0)]
    for _ in range(n - 1):
        out.append(gl2.host_mul(out[-1], alpha))
    return out


@jax.jit
def _eval_columns_core(coeffs: gl.Gf, zc: gl2.Gf2):
    n = coeffs[0].shape[-1]
    zp = _ext_powers_device(zc, n)             # (N,) ext
    terms = gl2.mul_base(gl2.reshape(zp, (1, n)), coeffs)  # (C, N) ext
    return gl2.sum_axis(terms, axis=-1)


def eval_columns_at(coeffs: gl.Gf, z: Ext) -> np.ndarray:
    """Evaluate all polynomials (rows of coeffs (C, N)) at extension point z.

    Returns a host (C, 2) u64 array.
    """
    return eval_columns_at_many([(coeffs, z)])[0]


def eval_columns_at_many(pairs, extra=()) -> list:
    """Batched eval_columns_at: dispatch every (coeffs, z) evaluation,
    then fetch ALL results in one device->host round trip (the per-table
    opening set is 5 evaluations; serial fetches over a remote-TPU tunnel
    dominated the warm prove).

    `extra`: additional device Gf values to ride the same fetch; their u64
    arrays are appended to the returned list after the (C, 2) openings."""
    outs = []
    for coeffs, z in pairs:
        zc = gl2.scalar_from_u64s(z[0], z[1])
        s = _eval_columns_core(coeffs, zc)
        outs.append((s[0], s[1]))
    flat = gl.to_u64_many([g for pair in outs for g in pair]
                          + list(extra))
    return [np.stack([flat[2 * i], flat[2 * i + 1]], axis=-1)
            for i in range(len(outs))] + flat[2 * len(outs):]


def _ext_powers_device(z: gl2.Gf2, n: int) -> gl2.Gf2:
    """[1, z, ..., z^(n-1)] via bit-decomposition (concat-free)."""
    num_bits = max(1, (n - 1).bit_length())
    k = jnp.arange(n, dtype=jnp.uint32)
    p0 = gl.ones((n,))
    p1 = gl.zeros((n,))
    pows = (p0, p1)
    sq = z
    for b in range(num_bits):
        mask = ((k >> b) & 1) == 1
        nxt = gl2.mul(pows, sq)   # scalar broadcasts elementwise
        pows = gl2.select(mask, nxt, pows)
        if b + 1 < num_bits:
            sq = gl2.square(sq)
    return pows


@partial(jax.jit, static_argnums=(0,))
def _batch_quotient_core(ranges, oracle_leaves, alpha_pows: gl2.Gf2,
                         cz: gl2.Gf2, z: gl2.Gf2, xs: gl.Gf) -> gl2.Gf2:
    """(sum_i alpha^i p_i(x) - comp(z)) / (x - z) over the LDE leaves.

    Vectorized per column range: one broadcast multiply + log-depth
    reduction instead of a per-column multiply chain (hundreds of columns
    would otherwise dominate trace/compile time)."""
    m = xs[0].shape[0]
    acc = None
    i = 0
    for r in ranges:
        leaves = oracle_leaves[r.oracle]  # (M, C)
        sub = gl.getitem(leaves, (slice(None), slice(r.start, r.stop)))
        a0 = gl.getitem(alpha_pows[0], slice(i, i + r.count))  # (k,)
        a1 = gl.getitem(alpha_pows[1], slice(i, i + r.count))
        term = (gl.sum_axis(gl.mul(sub, a0), -1),
                gl.sum_axis(gl.mul(sub, a1), -1))
        acc = term if acc is None else gl2.add(acc, term)
        i += r.count
    num = gl2.sub(acc, cz)
    den = gl2.sub((xs, gl.zeros((m,))), z)
    return gl2.mul(num, gl2.inverse(den))


@jax.jit
def _shift_accumulate(final: gl2.Gf2, shift: gl2.Gf2, quot: gl2.Gf2):
    return gl2.add(gl2.mul(final, shift), quot)


def open_and_prove(batches: Sequence[OpeningBatch],
                   openings_per_batch: Sequence[np.ndarray],
                   oracles: Sequence[PolynomialBatch],
                   challenger: Challenger,
                   config: FriConfig) -> FriProof:
    """openings_per_batch[b]: (num_polys, 2) u64 values p_i(z_b), already
    observed by the caller (STARK layer draws/observes them first)."""
    degree_bits = oracles[0].degree_bits
    log_m = degree_bits + config.rate_bits

    alpha = challenger.get_extension_challenge()

    xs = lde_points_bitrev(log_m, gl.GENERATOR)
    oracle_leaves = tuple(o.leaves for o in oracles)
    final = None
    for batch, opens in zip(batches, openings_per_batch):
        alpha_pows = _alpha_powers_host(alpha, max(1, batch.num_polys))
        ap = np.array(alpha_pows, dtype=np.uint64)  # (k, 2)
        ap_gf = gl2.from_u64_pair(ap[:, 0], ap[:, 1])
        # comp(z) from the opened values (host ints)
        cz = (0, 0)
        for i in range(batch.num_polys):
            term = gl2.host_mul(alpha_pows[i],
                                (int(opens[i][0]), int(opens[i][1])))
            cz = ((cz[0] + term[0]) % gl.P, (cz[1] + term[1]) % gl.P)
        quot = _batch_quotient_core(
            batch.ranges, oracle_leaves, ap_gf,
            gl2.scalar_from_u64s(*cz), gl2.scalar_from_u64s(*batch.point),
            (jnp.asarray(xs[0]), jnp.asarray(xs[1])))
        if final is None:
            final = quot
        else:
            shift = gl2.host_pow(alpha, batch.num_polys)
            final = _shift_accumulate(
                final, gl2.scalar_from_u64s(*shift), quot)

    return fri_prove(oracles, final, degree_bits, challenger, config)


def make_combine_initial(batches: Sequence[OpeningBatch],
                         openings_per_batch: Sequence[np.ndarray],
                         alpha: Ext,
                         degree_bits: int,
                         config: FriConfig):
    """Verifier-side combine callback for verify_fri_proof."""
    log_m = degree_bits + config.rate_bits
    w = gl.primitive_root_of_unity(log_m)

    def combine(x_index: int, evals_per_oracle: List[np.ndarray]) -> Ext:
        rev = int(bin(x_index)[2:].zfill(log_m)[::-1], 2) if log_m else 0
        x = (gl.GENERATOR * pow(w, rev, gl.P)) % gl.P
        acc: Ext = (0, 0)
        for batch, opens in zip(batches, openings_per_batch):
            alpha_pows = _alpha_powers_host(alpha, max(1, batch.num_polys))
            red: Ext = (0, 0)
            cz: Ext = (0, 0)
            i = 0
            for r in batch.ranges:
                for c in range(r.start, r.stop):
                    v = int(evals_per_oracle[r.oracle][c])
                    t = ((alpha_pows[i][0] * v) % gl.P,
                         (alpha_pows[i][1] * v) % gl.P)
                    red = ((red[0] + t[0]) % gl.P, (red[1] + t[1]) % gl.P)
                    o = gl2.host_mul(alpha_pows[i],
                                     (int(opens[i][0]), int(opens[i][1])))
                    cz = ((cz[0] + o[0]) % gl.P, (cz[1] + o[1]) % gl.P)
                    i += 1
            num = ((red[0] - cz[0]) % gl.P, (red[1] - cz[1]) % gl.P)
            den = ((x - batch.point[0]) % gl.P, (-batch.point[1]) % gl.P)
            quot = gl2.host_mul(num, gl2.host_inv(den))
            shift = gl2.host_pow(alpha, batch.num_polys)
            acc = gl2.host_mul(acc, shift)
            acc = ((acc[0] + quot[0]) % gl.P, (acc[1] + quot[1]) % gl.P)
        return acc

    return combine
