"""Composition of per-point constraint evaluation.

Reference: /root/reference/prover/src/vanishing_poly.rs — order matters for
alpha accumulation: (1) the STARK's own constraints, (2) in-table logUp
lookups, (3) cross-table lookup checks.
"""

from __future__ import annotations

from .cross_table_lookup import eval_cross_table_lookup_checks
from .lookup import eval_packed_lookups_generic


def eval_vanishing_poly(algebra, stark, local, nxt, lookup_vars, ctl_vars,
                        consumer):
    """lookup_vars: None or (lookup_local, lookup_next, challenges)."""
    stark.eval_generic(algebra, local, nxt, consumer)
    if lookup_vars is not None:
        lookup_local, lookup_next, challenges = lookup_vars
        eval_packed_lookups_generic(
            algebra, stark.lookups(), local, nxt, lookup_local, lookup_next,
            challenges, stark.constraint_degree, consumer)
    if ctl_vars:
        eval_cross_table_lookup_checks(
            algebra, local, nxt, ctl_vars, consumer, stark.constraint_degree)
