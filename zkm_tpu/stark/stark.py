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

    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(self) is type(other)

    def eval_generic(self, algebra, local, nxt, consumer):
        raise NotImplementedError

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
