"""STARK proof containers (host-side numpy/int data).

Reference: /root/reference/prover/src/proof.rs — StarkProof{trace_cap,
auxiliary_polys_cap, quotient_polys_cap, openings, opening_proof},
StarkProofWithMetadata{init_challenger_state, proof}, AllProof{stark_proofs,
ctl_challenges, public_values}, PublicValues{roots_before, roots_after,
userdata}.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np

from ..fri.proof import FriProof
from .cross_table_lookup import GrandProductChallengeSet


@dataclass
class MemRoots:
    """Pre/post state commitment: image id as 8 u32 words.

    The reference transmutes [u8;32] -> [u32;8] (generation/mod.rs:61-69),
    i.e. little-endian words of the image-id bytes."""
    root: List[int]  # 8 u32 values

    @staticmethod
    def from_image_id(image_id: bytes) -> "MemRoots":
        assert len(image_id) == 32
        return MemRoots([int.from_bytes(image_id[i:i + 4], "little")
                         for i in range(0, 32, 4)])

    def to_image_id(self) -> bytes:
        return b"".join(int(w).to_bytes(4, "little") for w in self.root)


@dataclass
class PublicValues:
    roots_before: MemRoots
    roots_after: MemRoots
    userdata: bytes  # 32 bytes: SHA256 of the public input


@dataclass
class StarkOpeningSet:
    local_values: np.ndarray          # (C, 2) u64 ext
    next_values: np.ndarray           # (C, 2)
    auxiliary_polys: np.ndarray       # (A, 2)
    auxiliary_polys_next: np.ndarray  # (A, 2)
    ctl_zs_first: np.ndarray          # (Z,) u64 base
    quotient_polys: np.ndarray        # (Q, 2)

    def fri_batches(self):
        """Values per FRI batch, matching stark fri_instance order."""
        zeta = np.concatenate([self.local_values, self.auxiliary_polys,
                               self.quotient_polys], axis=0)
        zeta_next = np.concatenate(
            [self.next_values, self.auxiliary_polys_next], axis=0)
        ctl_first = np.stack(
            [self.ctl_zs_first, np.zeros_like(self.ctl_zs_first)], axis=1)
        return [zeta, zeta_next, ctl_first]


@dataclass
class StarkProof:
    trace_cap: np.ndarray             # (2^cap, 4) u64
    auxiliary_polys_cap: np.ndarray
    quotient_polys_cap: np.ndarray
    openings: StarkOpeningSet
    opening_proof: FriProof

    def recover_degree_bits(self, config) -> int:
        """From the FRI query structure (reference proof.rs:31-40): the
        trace-oracle Merkle path length + cap height gives log2(LDE size);
        subtract rate_bits for the trace degree."""
        fri = config.fri_config
        q0 = self.opening_proof.query_round_proofs[0]
        path = q0.initial_trees_proof.merkle_proofs[0]
        lde_bits = len(path) + fri.cap_height
        return lde_bits - fri.rate_bits


@dataclass
class StarkProofWithMetadata:
    init_challenger_state: List[int]  # 12 sponge elements
    proof: StarkProof
    degree_bits: int


@dataclass
class AllProof:
    stark_proofs: List[StarkProofWithMetadata]
    ctl_challenges: GrandProductChallengeSet
    public_values: PublicValues

    def degree_bits(self) -> List[int]:
        return [p.degree_bits for p in self.stark_proofs]
