"""Stark base class.

Reference: the `Stark` trait in /root/reference/prover/src/stark.rs.  One
`eval_generic` implementation serves both the vectorized device prover
(BatchAlgebra over quotient-domain arrays) and the host verifier
(ExtAlgebra at zeta) — the Python analog of the reference's
eval_packed_generic / eval_ext pairing.
"""

from __future__ import annotations

from typing import List

from .lookup import Lookup


class Stark:
    """Subclasses define `num_columns`, `eval_generic`, optionally `lookups`.

    Instances are stateless; they hash/compare by type so jitted prover
    functions (which take the stark as a static argument) share traces and
    compiled code across instances."""

    num_columns: int = 0
    constraint_degree: int = 3
    # Number of public-input scalars bound into the constraints (boundary
    # constraints against per-proof public values).  Tables with publics
    # implement eval_generic with a trailing `publics` argument; the claim
    # values ride the same PARAM mechanism as the CTL challenges on the
    # device path (stark/expr.py), host ints on the verifier, and wires in
    # the recursion recorder.
    num_public_inputs: int = 0

    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(self) is type(other)

    def eval_generic(self, algebra, local, nxt, consumer):
        raise NotImplementedError

    def public_inputs(self, roots_before, roots_after, userdata) -> list:
        """Select this table's public-input scalars from the proof claim
        (roots_before/after: 8 elements each; userdata: 32 elements).
        Generic over element type (ints, traced scalars, or DAG wires)."""
        return []

    def lookups(self) -> List[Lookup]:
        return []

    @property
    def quotient_degree_factor(self) -> int:
        return max(1, self.constraint_degree - 1)

    def num_quotient_polys(self, config) -> int:
        return self.quotient_degree_factor * config.num_challenges

    def num_lookup_helper_columns(self, config) -> int:
        return sum(l.num_helper_columns(self.constraint_degree)
                   for l in self.lookups()) * config.num_challenges

    def uses_lookups(self) -> bool:
        return bool(self.lookups())
