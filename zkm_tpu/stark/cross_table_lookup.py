"""logUp cross-table lookup engine.

Reference: /root/reference/prover/src/cross_table_lookup.rs — semantics are
mirrored exactly (SURVEY.md §8): helper columns batch looking column-sets in
chunks of constraint_degree-1 = 2; the CTL Z polynomial is a *reverse*
cumulative sum (Z(row 0) holds the grand total, opened at point 1); cross-
table verification checks sum of looking ctl_zs_first == looked ctl_zs_first.

TPU-first: helper columns evaluate whole traces at once (vectorized column
combos + masked batched inversion); Z suffix-sums use
`jax.lax.associative_scan` (log-depth) instead of the reference's sequential
row loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from .columns import Column, Filter

P = gl.P


def _scal(v):
    """int -> () Gf constant; Gf pairs (incl. traced) pass through."""
    return gl.full((), v % P) if isinstance(v, (int, np.integer)) else v


@dataclass(frozen=True)
class GrandProductChallenge:
    """beta/gamma are ints on the host/transcript path, or () Gf pairs when
    flowing through jitted device code (traced arguments, so challenge
    values do not bake into compiled graphs)."""
    beta: object
    gamma: object

    def combine_host(self, terms, algebra):
        """reduce_with_powers(terms, beta) + gamma (term 0 lowest power)."""
        acc = algebra.zero
        for t in reversed(list(terms)):
            acc = algebra.add(algebra.mul_scalar(acc, self.beta), t)
        return algebra.add_scalar(acc, self.gamma)

    def combine_all_rows(self, cols: List[gl.Gf]) -> gl.Gf:
        beta = _scal(self.beta)
        acc = gl.zeros(cols[0][0].shape)
        for t in reversed(cols):
            acc = gl.add(gl.mul(acc, beta), t)
        return gl.add(acc, _scal(self.gamma))

    def as_gf(self) -> "GrandProductChallenge":
        return GrandProductChallenge(_scal(self.beta), _scal(self.gamma))


@dataclass
class GrandProductChallengeSet:
    challenges: List[GrandProductChallenge]


def get_grand_product_challenge_set(challenger, num_challenges: int
                                    ) -> GrandProductChallengeSet:
    out = []
    for _ in range(num_challenges):
        beta = challenger.get_challenge()
        gamma = challenger.get_challenge()
        out.append(GrandProductChallenge(beta, gamma))
    return GrandProductChallengeSet(out)


@dataclass(frozen=True)
class TableWithColumns:
    table: int
    columns: Tuple[Column, ...]
    filter: Optional[Filter]


@dataclass(frozen=True)
class CrossTableLookup:
    looking_tables: Tuple[TableWithColumns, ...]
    looked_table: TableWithColumns

    def __post_init__(self):
        n = len(self.looked_table.columns)
        assert all(len(t.columns) == n for t in self.looking_tables)


@dataclass
class CtlZData:
    helper_columns: List[gl.Gf]     # each (N,)
    z: gl.Gf                        # (N,)
    challenge: GrandProductChallenge
    columns: List[Tuple[Column, ...]]
    filters: List[Optional[Filter]]


@dataclass
class CtlData:
    zs_columns: List[CtlZData] = field(default_factory=list)

    def ctl_helper_polys(self) -> List[gl.Gf]:
        out = []
        for zcols in self.zs_columns:
            out.extend(zcols.helper_columns)
        return out

    def ctl_z_polys(self) -> List[gl.Gf]:
        return [z.z for z in self.zs_columns]

    def num_ctl_helper_polys(self) -> List[int]:
        return [len(z.helper_columns) for z in self.zs_columns]


# ---------------------------------------------------------------------------
# Trace-side computation (device, vectorized).
# ---------------------------------------------------------------------------

def _masked_combined(trace: gl.Gf, columns: Tuple[Column, ...],
                     filt: Optional[Filter],
                     challenge: GrandProductChallenge):
    """Per-row combine(columns)+gamma where filter==1, else 1, plus the
    mask (True where the row participates)."""
    col_vals = [c.eval_all_rows(trace) for c in columns]
    combined = challenge.combine_all_rows(col_vals)
    n = trace[0].shape[-1]
    if filt is None:
        fvals = gl.ones((n,))
    else:
        fvals = filt.eval_all_rows(trace)
    mask = (fvals[0] == 1) & (fvals[1] == 0)   # filter == 1 exactly
    safe = gl.select(mask, combined, gl.ones((n,)))
    return safe, mask


def get_helper_cols(trace: gl.Gf, columns_filters, challenge,
                    constraint_degree: int) -> List[gl.Gf]:
    """Chunks of (degree-1) column-sets; helper = sum of masked inverses.

    All column-sets invert in ONE stacked batch (a 34-entry sponge group
    traced 34 separate 64-step inverse chains before; now one (k, n)
    inverse)."""
    terms = [_masked_combined(trace, cols, filt, challenge)
             for cols, filt in columns_filters]
    stacked = (jnp.stack([t[0][0] for t in terms]),
               jnp.stack([t[0][1] for t in terms]))
    masks = jnp.stack([t[1] for t in terms])
    inv = gl.inverse(stacked)                       # (k, n)
    zero = gl.zeros(masks.shape)
    masked = gl.select(masks, inv, zero)

    batch = constraint_degree - 1
    out = []
    for i in range(0, len(columns_filters), batch):
        hi = min(i + batch, len(columns_filters))
        acc = (masked[0][i], masked[1][i])
        for j in range(i + 1, hi):
            acc = gl.add(acc, (masked[0][j], masked[1][j]))
        out.append(acc)
    return out


def _suffix_sum(x: gl.Gf) -> gl.Gf:
    """z[i] = sum_{j >= i} x[j] via log-depth associative scan."""
    rev = (x[0][::-1], x[1][::-1])
    scanned = jax.lax.associative_scan(lambda a, b: gl.add(a, b), rev)
    return (scanned[0][::-1], scanned[1][::-1])


def partial_sums(trace: gl.Gf, columns_filters, challenge,
                 constraint_degree: int) -> List[gl.Gf]:
    """Helper columns plus the reverse-cumulative-sum Z column.

    Z(row i) = sum over rows j >= i of sum_k h_k(j); Z(row 0) = grand total.
    If there is a single column-set, only [Z] is returned (no helper)."""
    helpers = get_helper_cols(trace, columns_filters, challenge,
                              constraint_degree)
    total = helpers[0]
    for h in helpers[1:]:
        total = gl.add(total, h)
    z = _suffix_sum(total)
    if len(columns_filters) > 1:
        return helpers + [z]
    return [z]


@partial(jax.jit, static_argnums=(2, 3))
def _helpers_static(trace, challenge_gf, columns_filters, constraint_degree):
    ch = GrandProductChallenge(challenge_gf[0], challenge_gf[1])
    return get_helper_cols(trace, list(columns_filters), ch,
                           constraint_degree)


@jax.jit
def _z_from_helpers(helpers):
    """Separate jit so the associative scan sees a materialized input —
    scans lower to concatenates, and XLA CPU's LLVM hangs on concat fusions
    with deep elementwise producers (see project memory)."""
    total = helpers[0]
    for h in helpers[1:]:
        total = gl.add(total, h)
    return _suffix_sum(total)


def partial_sums_compiled(trace, columns_filters, challenge,
                          constraint_degree):
    """Jitted partial_sums: column structure static, challenge traced."""
    cf = tuple((tuple(c), f) for c, f in columns_filters)
    ch_gf = (_scal(challenge.beta), _scal(challenge.gamma))
    helpers = _helpers_static(trace, ch_gf, cf, constraint_degree)
    z = _z_from_helpers(helpers)
    if len(cf) > 1:
        return helpers + [z]
    return [z]


def cross_table_lookup_data(trace_per_table: List[gl.Gf],
                            ctls: Sequence[CrossTableLookup],
                            ctl_challenges: GrandProductChallengeSet,
                            constraint_degree: int) -> List[CtlData]:
    num_tables = len(trace_per_table)
    data = [CtlData() for _ in range(num_tables)]
    for ctl in ctls:
        for challenge in ctl_challenges.challenges:
            # group looking tables by table id, preserving first-seen order
            grouped: Dict[int, List[TableWithColumns]] = {}
            for t in ctl.looking_tables:
                grouped.setdefault(t.table, []).append(t)
            for table, group in grouped.items():
                cf = [(t.columns, t.filter) for t in group]
                cols = partial_sums_compiled(
                    trace_per_table[table], cf, challenge, constraint_degree)
                data[table].zs_columns.append(CtlZData(
                    helper_columns=cols[:-1], z=cols[-1],
                    challenge=challenge,
                    columns=[t.columns for t in group],
                    filters=[t.filter for t in group]))
            lt = ctl.looked_table
            zcols = partial_sums_compiled(
                trace_per_table[lt.table], [(lt.columns, lt.filter)],
                challenge, constraint_degree)
            data[lt.table].zs_columns.append(CtlZData(
                helper_columns=[], z=zcols[0], challenge=challenge,
                columns=[lt.columns], filters=[lt.filter]))
    return data


# ---------------------------------------------------------------------------
# Constraint-side evaluation (generic algebra).
# ---------------------------------------------------------------------------

def build_ctl_check_vars(aux_local, aux_next, num_lookup: int,
                         ctl_structure, chal_values):
    """CtlCheckVars from a static aux-layout description.

    ctl_structure: tuple of (num_helpers, challenge_idx, columns, filters);
    chal_values: list of (beta, gamma) algebra values (traced Gf scalars on
    the device path, symbolic PARAM nodes in the expression compiler)."""
    ctl_vars = []
    total_helpers = sum(s[0] for s in ctl_structure)
    h = num_lookup
    for k, (nh, ci, columns, filters) in enumerate(ctl_structure):
        zi = num_lookup + total_helpers + k
        beta, gamma = chal_values[ci]
        ctl_vars.append(CtlCheckVars(
            helper_columns=aux_local[h:h + nh],
            local_z=aux_local[zi], next_z=aux_next[zi],
            challenge=GrandProductChallenge(beta, gamma),
            columns=list(columns), filters=list(filters)))
        h += nh
    return ctl_vars


@dataclass
class CtlCheckVars:
    helper_columns: List        # algebra values
    local_z: object
    next_z: object
    challenge: GrandProductChallenge
    columns: List[Tuple[Column, ...]]
    filters: List[Optional[Filter]]


def eval_helper_columns(algebra, filters, column_evals, local, nxt,
                        helper_values, constraint_degree, challenge,
                        consumer):
    """Check h_i * prod(combin) == sum of cross-filtered combins.

    column_evals: list of per-column-set lists of algebra values."""
    if not helper_values:
        return
    batch = constraint_degree - 1
    for j in range(0, len(column_evals), batch):
        chunk = column_evals[j:j + batch]
        fs = filters[j:j + len(chunk)]
        h = helper_values[j // batch]
        combins = [challenge.combine_host(c, algebra) for c in chunk]
        fvals = [f.eval(algebra, local, nxt) if f is not None else algebra.one
                 for f in fs]
        if len(chunk) == 2:
            lhs = algebra.mul(algebra.mul(combins[1], combins[0]), h)
            rhs = algebra.add(algebra.mul(fvals[0], combins[1]),
                              algebra.mul(fvals[1], combins[0]))
            consumer.constraint(algebra.sub(lhs, rhs))
        elif len(chunk) == 1:
            consumer.constraint(
                algebra.sub(algebra.mul(combins[0], h), fvals[0]))
        else:
            raise NotImplementedError("constraint degree != 3")


def eval_cross_table_lookup_checks(algebra, local, nxt, ctl_vars,
                                   consumer, constraint_degree: int):
    for v in ctl_vars:
        evals = [[c.eval(algebra, local, nxt) for c in cols]
                 for cols in v.columns]
        eval_helper_columns(algebra, v.filters, evals, local, nxt,
                            v.helper_columns, constraint_degree,
                            v.challenge, consumer)
        if v.helper_columns:
            h_sum = algebra.zero
            for h in v.helper_columns:
                h_sum = algebra.add(h_sum, h)
            consumer.constraint_last_row(algebra.sub(v.local_z, h_sum))
            consumer.constraint_transition(
                algebra.sub(algebra.sub(v.local_z, v.next_z), h_sum))
        elif len(v.columns) > 1:
            combin0 = v.challenge.combine_host(evals[0], algebra)
            combin1 = v.challenge.combine_host(evals[1], algebra)
            f0 = v.filters[0].eval(algebra, local, nxt) \
                if v.filters[0] is not None else algebra.one
            f1 = v.filters[1].eval(algebra, local, nxt) \
                if v.filters[1] is not None else algebra.one
            rhs = algebra.add(algebra.mul(f0, combin1),
                              algebra.mul(f1, combin0))
            prod = algebra.mul(combin0, combin1)
            consumer.constraint_last_row(
                algebra.sub(algebra.mul(prod, v.local_z), rhs))
            consumer.constraint_transition(
                algebra.sub(algebra.mul(
                    prod, algebra.sub(v.local_z, v.next_z)), rhs))
        else:
            combin0 = v.challenge.combine_host(evals[0], algebra)
            f0 = v.filters[0].eval(algebra, local, nxt) \
                if v.filters[0] is not None else algebra.one
            consumer.constraint_last_row(
                algebra.sub(algebra.mul(combin0, v.local_z), f0))
            consumer.constraint_transition(
                algebra.sub(algebra.mul(
                    combin0, algebra.sub(v.local_z, v.next_z)), f0))


def ctl_check_vars_from_proofs(openings_per_table, ctls,
                               ctl_challenges: GrandProductChallengeSet,
                               num_lookup_columns: List[int],
                               num_helper_ctl_columns: List[List[int]],
                               ) -> List[List[CtlCheckVars]]:
    """Split each table's auxiliary openings into per-CTL CtlCheckVars.

    openings_per_table[t] = (aux_local, aux_next) host ext lists.
    num_helper_ctl_columns[i][t]: helpers for CTL i in table t.
    Mirrors CtlCheckVars::from_proofs (cross_table_lookup.rs:892-1000)."""
    num_tables = len(openings_per_table)
    nchal = len(ctl_challenges.challenges)
    total_helpers = [0] * num_tables
    for per_table in num_helper_ctl_columns:
        for t in range(num_tables):
            total_helpers[t] += per_table[t] * nchal
    start_indices = [0] * num_tables
    z_indices = [0] * num_tables
    out = [[] for _ in range(num_tables)]
    for ctl, num_ctls in zip(ctls, num_helper_ctl_columns):
        for challenge in ctl_challenges.challenges:
            seen = []
            for t in ctl.looking_tables:
                if t.table not in seen:
                    seen.append(t.table)
            for table in seen:
                aux_local, aux_next = openings_per_table[table]
                nl = num_lookup_columns[table]
                zi = nl + total_helpers[table] + z_indices[table]
                group = [t for t in ctl.looking_tables if t.table == table]
                hstart = nl + start_indices[table]
                helpers = aux_local[hstart:hstart + num_ctls[table]]
                start_indices[table] += num_ctls[table]
                z_indices[table] += 1
                out[table].append(CtlCheckVars(
                    helper_columns=list(helpers),
                    local_z=aux_local[zi], next_z=aux_next[zi],
                    challenge=challenge,
                    columns=[t.columns for t in group],
                    filters=[t.filter for t in group]))
            lt = ctl.looked_table
            aux_local, aux_next = openings_per_table[lt.table]
            nl = num_lookup_columns[lt.table]
            zi = nl + total_helpers[lt.table] + z_indices[lt.table]
            z_indices[lt.table] += 1
            out[lt.table].append(CtlCheckVars(
                helper_columns=[], local_z=aux_local[zi],
                next_z=aux_next[zi], challenge=challenge,
                columns=[lt.columns], filters=[lt.filter]))
    return out


def num_ctl_helper_columns_by_table(ctls, num_tables: int) -> List[List[int]]:
    """Per CTL: helpers per table (ceil(appearances/2) if appearances>1)."""
    out = []
    for ctl in ctls:
        counts = [0] * num_tables
        per = [0] * num_tables
        for t in ctl.looking_tables:
            counts[t.table] += 1
        for t in range(num_tables):
            if counts[t] > 1:
                per[t] = (counts[t] + 1) // 2
            elif counts[t] == 1:
                per[t] = 0
        out.append(per)
    return out


def verify_cross_table_lookups(ctls, ctl_zs_first: List[List[int]],
                               num_challenges: int):
    """sum of looking tables' ctl_zs_first == looked table's, per challenge."""
    iters = [iter(v) for v in ctl_zs_first]
    for index, ctl in enumerate(ctls):
        seen = []
        for t in ctl.looking_tables:
            if t.table not in seen:
                seen.append(t.table)
        for _ in range(num_challenges):
            looking_sum = sum(next(iters[t]) for t in seen) % P
            looked = next(iters[ctl.looked_table.table]) % P
            if looking_sum != looked:
                raise ValueError(
                    f"cross-table lookup {index} verification failed")
    for it in iters:
        try:
            next(it)
            raise ValueError("unconsumed ctl_zs_first opening")
        except StopIteration:
            pass
