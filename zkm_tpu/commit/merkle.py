"""Merkle tree with cap over Poseidon digests, batched leaf hashing on device.

Reference analog: plonky2 `MerkleTree`/`MerkleCap` used by `PolynomialBatch`
(SURVEY.md layer 0; cap_height=4 per prover/src/config.rs).  Leaves are rows
of field elements; leaf digest = `hash_or_noop(row)`; interior nodes =
`two_to_one(left, right)`; the tree stops at 2^cap_height nodes (the "cap"),
which is what the challenger observes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..hash import poseidon as ps


@dataclass
class MerkleTree:
    """Digest levels from leaf digests down to the cap.

    levels[0] = leaf digests (L, 4); levels[k] has L/2^k rows; the last level
    is the cap (2^cap_height, 4).
    """
    levels: List[gl.Gf]
    cap_height: int

    @property
    def cap(self) -> gl.Gf:
        return self.levels[-1]

    @property
    def num_leaves(self) -> int:
        return self.levels[0][0].shape[0]

    def open(self, index: int):
        """Merkle path for leaf `index`: list of sibling digests, leaf->cap."""
        sibs = []
        i = index
        for level in self.levels[:-1]:
            sibs.append(gl.getitem(level, i ^ 1))
            i >>= 1
        return sibs

    def open_batch_device(self, indices):
        """Device-side stacked sibling gather: (n_levels, Q, 4) Gf, or
        None for a cap-sized tree (exactly 2^cap_height leaves: the leaf
        digests ARE the cap, so every path is empty — hit by min-height
        tables (2^6 rows) in the FRI commit phase under
        standard_fast_config).  Lets callers batch the device->host fetch
        of many trees' paths into one round trip."""
        if len(self.levels) == 1:
            return None
        idx = np.array(indices, dtype=np.int64)
        return _open_batch_core(tuple(self.levels[:-1]), idx)

    @staticmethod
    def paths_from_stacked(arr, n_queries: int) -> List[List[np.ndarray]]:
        """(n_levels, Q, 4) u64 -> [per query: [sibling (4,) ...]]."""
        if arr is None:
            return [[] for _ in range(n_queries)]
        return [[arr[lvl, q] for lvl in range(arr.shape[0])]
                for q in range(n_queries)]

    def open_batch(self, indices) -> List[List[np.ndarray]]:
        """Merkle paths for many leaves in ONE jitted gather over all
        levels + one transfer (37 FRI queries x log_m levels of per-query
        `open` calls were hundreds of tiny device->host round-trips, and
        per-level dispatch still paid ~60 kernel compiles on a remote-TPU
        backend).  Returns [per index: [sibling u64 (4,) ...]]."""
        stacked = self.open_batch_device(indices)
        arr = gl.to_u64(stacked) if stacked is not None else None
        return self.paths_from_stacked(arr, len(indices))


@jax.jit
def _open_batch_core(levels, idx):
    """Gather sibling digests for every level in one compiled call:
    levels = tuple of (lo, hi) (L_k, 4) pairs; idx (Q,) leaf indices.
    Returns stacked (n_levels, Q, 4) Gf."""
    out_lo, out_hi = [], []
    for lo, hi in levels:
        sib_idx = idx ^ 1
        out_lo.append(lo[sib_idx])
        out_hi.append(hi[sib_idx])
        idx = idx >> 1
    return (jnp.stack(out_lo), jnp.stack(out_hi))


@jax.jit
def _leaf_digests(leaves: gl.Gf) -> gl.Gf:
    return ps.hash_or_noop(leaves)


@jax.jit
def _compress_level(cur: gl.Gf) -> gl.Gf:
    left = gl.getitem(cur, (slice(0, None, 2),))
    right = gl.getitem(cur, (slice(1, None, 2),))
    return ps.two_to_one(left, right)


def build_levels_body(leaves: gl.Gf, cap_height: int):
    """Traceable body: leaf digests + every fold level (embed in a larger
    jit to share one Pallas lowering across the fixed-chunk permutes)."""
    levels = [ps.hash_or_noop(leaves)]
    while levels[-1][0].shape[0] > (1 << cap_height):
        levels.append(_compress_level_body(levels[-1]))
    return levels


@partial(jax.jit, static_argnums=(1,))
def _build_levels(leaves: gl.Gf, cap_height: int):
    """One compiled graph per (shape, cap): per-level jits each paid a
    fresh Pallas lowering (~20 s/shape/process on TPU)."""
    return build_levels_body(leaves, cap_height)


def _compress_level_body(cur: gl.Gf) -> gl.Gf:
    left = gl.getitem(cur, (slice(0, None, 2),))
    right = gl.getitem(cur, (slice(1, None, 2),))
    return ps.two_to_one(left, right)


def build_merkle_tree(leaves: gl.Gf, cap_height: int) -> MerkleTree:
    """leaves: (L, W) field elements; L a power of two, L >= 2^cap_height."""
    n = leaves[0].shape[0]
    assert n & (n - 1) == 0 and n >= (1 << cap_height)
    return MerkleTree(levels=_build_levels(leaves, cap_height),
                      cap_height=cap_height)


def verify_merkle_proof(leaf_data: gl.Gf, index: int, siblings, cap: gl.Gf) -> bool:
    """Host-side check that `leaf_data` (row of field elements) is at `index`."""
    digest = ps.hash_or_noop(leaf_data)
    i = index
    for sib in siblings:
        left, right = (digest, sib) if i % 2 == 0 else (sib, digest)
        digest = ps.two_to_one(left, right)
        i >>= 1
    want = gl.to_u64(gl.getitem(cap, i))
    return bool(np.array_equal(gl.to_u64(digest), want))
