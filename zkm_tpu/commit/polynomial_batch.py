"""Batched polynomial commitment: iNTT -> coset LDE -> Merkle cap.

Reference analog: plonky2 `PolynomialBatch::from_values` — the #1 hot kernel
of the reference prover (SURVEY.md §3.2: "12x PolynomialBatch::from_values
(HOT: iFFT -> coset LDE -> Merkle)").

Conventions (bit-exact plonky2 semantics):
  * LDE is evaluated on the coset g*H (g=7) at rate 2^rate_bits.
  * Committed leaves are the transposed LDE rows in *bit-reversed* point
    order: leaf i corresponds to evaluation point g * omega^{rev(i)}.
  * FRI query index i addresses leaf i directly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field import ntt
from .merkle import MerkleTree, build_merkle_tree


@dataclass
class PolynomialBatch:
    coeffs: gl.Gf          # (C, N) coefficient form
    leaves: gl.Gf          # (N << rate_bits, C): LDE rows, bit-reversed order
    tree: MerkleTree
    rate_bits: int
    cap_height: int

    @property
    def degree(self) -> int:
        return self.coeffs[0].shape[-1]

    @property
    def degree_bits(self) -> int:
        return self.degree.bit_length() - 1

    @property
    def lde_size(self) -> int:
        return self.leaves[0].shape[0]

    def cap_u64(self) -> np.ndarray:
        return gl.to_u64(self.tree.cap)

    def release(self):
        """Drop the LDE leaves, tree, and coefficients so the device
        allocator can reclaim them.  At hello-segment scale the per-table
        leaf arrays are hundreds of MB each and are dead the moment the
        table's FRI query extraction is done — holding all 6 tables'
        worth for the whole proof OOMs a 16 GB chip."""
        self.coeffs = None
        self.leaves = None
        self.tree = None

    def leaf_row(self, index: int) -> np.ndarray:
        """u64 row of all column values at leaf `index` (host)."""
        return gl.to_u64(gl.getitem(self.leaves, index))

    def open_row(self, index: int):
        """(leaf values u64, sibling digests u64 list) for a FRI query."""
        sibs = [gl.to_u64(s) for s in self.tree.open(index)]
        return self.leaf_row(index), sibs

    def open_rows(self, indices):
        """Batched open_row: one gather + transfer for all query leaves,
        one per tree level for the paths."""
        rows = gl.to_u64(gl.take(self.leaves, np.asarray(indices,
                                                        dtype=np.int64),
                                 axis=0))            # (Q, C)
        paths = self.tree.open_batch(indices)
        return rows, paths


# Twiddle/bit-reversal tables enter as traced arguments (not baked graph
# constants) so the compiled executables stay small — constants of LDE size
# blew the persistent compile cache up to 40+MB per entry.

@partial(jax.jit, static_argnums=(1,))
def _values_to_commitment_arrays(values: gl.Gf, rate_bits: int, intt_a,
                                 lde_a, rev_m):
    coeffs = ntt.intt(values, aux=intt_a)
    lde_nat = ntt.lde(coeffs, rate_bits, aux=lde_a)   # (C, N<<rate)
    lde_rev = gl.take(lde_nat, rev_m, axis=-1)
    leaves = (lde_rev[0].T, lde_rev[1].T)             # (M, C)
    return coeffs, leaves


@partial(jax.jit, static_argnums=(1,))
def _coeffs_to_commitment_arrays(coeffs: gl.Gf, rate_bits: int, lde_a,
                                 rev_m):
    lde_nat = ntt.lde(coeffs, rate_bits, aux=lde_a)
    lde_rev = gl.take(lde_nat, rev_m, axis=-1)
    return (lde_rev[0].T, lde_rev[1].T)


def from_values(values: gl.Gf, rate_bits: int, cap_height: int) -> PolynomialBatch:
    """values: (C, N) per-polynomial evaluations over the size-N subgroup."""
    log_n = values[0].shape[-1].bit_length() - 1
    coeffs, leaves = _values_to_commitment_arrays(
        values, rate_bits, ntt.ntt_aux(log_n, True),
        ntt.lde_aux(log_n, rate_bits),
        ntt.rev_indices_arg(log_n + rate_bits))
    tree = build_merkle_tree(leaves, cap_height)
    return PolynomialBatch(coeffs=coeffs, leaves=leaves, tree=tree,
                           rate_bits=rate_bits, cap_height=cap_height)


def from_coeffs(coeffs: gl.Gf, rate_bits: int, cap_height: int) -> PolynomialBatch:
    log_n = coeffs[0].shape[-1].bit_length() - 1
    leaves = _coeffs_to_commitment_arrays(
        coeffs, rate_bits, ntt.lde_aux(log_n, rate_bits),
        ntt.rev_indices_arg(log_n + rate_bits))
    tree = build_merkle_tree(leaves, cap_height)
    return PolynomialBatch(coeffs=coeffs, leaves=leaves, tree=tree,
                           rate_bits=rate_bits, cap_height=cap_height)
