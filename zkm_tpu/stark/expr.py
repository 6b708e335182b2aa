"""Symbolic constraint IR with hash-consing + CSE.

The CPU table's ~950 constraints contain heavy shared structure (bit
recompositions, partial limb sums, register-index reconstructions).  Traced
naively into XLA they produce a graph that takes an hour to compile.
Instead, `eval_generic` runs ONCE against `SymbolicAlgebra`, producing a
hash-consed DAG: every subexpression is interned, so the 32 nested partial
sums of `ext` collapse into 32 incremental adds, and cross-group repeats
(e.g. limb_from_bits(RS_BITS) in six groups) evaluate once.

The DAG is then evaluated with one Goldilocks op per unique node — the
constraint *order* (which fixes the verifier's alpha weights) is preserved
exactly, so the host verifier can keep evaluating eval_generic directly.

This is the TPU-first answer to the reference's per-point closure
evaluation (prover.rs:645-789): compile the constraint system once,
evaluate it whole-coset, let XLA fuse the small uniform op stream.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

from ..field import goldilocks as gl

P = gl.P

# node ops
LOCAL, NEXT, CONST, ADD, SUB, MUL, MULC, ADDC, PARAM = range(9)


class Node(int):
    """A hash-consed expression node id (distinct from plain int scalars)."""
    __slots__ = ()


class SymbolicAlgebra:
    """Algebra producing hash-consed Expr node ids."""

    def __init__(self):
        self.nodes: List[Tuple] = []      # (op, a, b) with ints
        self._intern: Dict[Tuple, int] = {}
        self._const: Dict[int, int] = {}
        self.zero = self.constant(0)
        self.one = self.constant(1)

    def _mk(self, key: Tuple) -> int:
        idx = self._intern.get(key)
        if idx is None:
            idx = len(self.nodes)
            self.nodes.append(key)
            self._intern[key] = idx
        return Node(idx)

    def node_const(self, idx: int):
        """Constant value of node idx, or None."""
        n = self.nodes[idx]
        return n[1] if n[0] == CONST else None

    def constant(self, c: int) -> int:
        return self._mk((CONST, c % P, 0))

    def local(self, col: int) -> int:
        return self._mk((LOCAL, col, 0))

    def next(self, col: int) -> int:
        return self._mk((NEXT, col, 0))

    def param(self, i: int) -> int:
        return self._mk((PARAM, i, 0))

    def add(self, a: int, b: int) -> int:
        ca, cb = self.node_const(a), self.node_const(b)
        if ca is not None and cb is not None:
            return self.constant(ca + cb)
        if ca == 0:
            return b
        if cb == 0:
            return a
        if cb is not None:
            return self._mk((ADDC, a, cb))
        if ca is not None:
            return self._mk((ADDC, b, ca))
        if a > b:
            a, b = b, a
        return self._mk((ADD, a, b))

    def sub(self, a: int, b: int) -> int:
        cb = self.node_const(b)
        if cb is not None:
            return self.add(a, self.constant(-cb))
        ca = self.node_const(a)
        if ca == 0:
            return self.mul_const(b, P - 1)
        return self._mk((SUB, a, b))

    def mul(self, a: int, b: int) -> int:
        ca, cb = self.node_const(a), self.node_const(b)
        if ca is not None and cb is not None:
            return self.constant(ca * cb)
        if ca is not None:
            return self.mul_const(b, ca)
        if cb is not None:
            return self.mul_const(a, cb)
        if a > b:
            a, b = b, a
        return self._mk((MUL, a, b))

    def mul_const(self, a: int, c: int) -> int:
        c %= P
        ca = self.node_const(a)
        if ca is not None:
            return self.constant(ca * c)
        if c == 0:
            return self.zero
        if c == 1:
            return a
        return self._mk((MULC, a, c))

    def add_const(self, a: int, c: int) -> int:
        return self.add(a, self.constant(c))

    def mul_scalar(self, a, s):
        if isinstance(s, Node):
            return self.mul(a, s)
        return self.mul_const(a, s)

    def add_scalar(self, a, s):
        if isinstance(s, Node):
            return self.add(a, s)
        return self.add_const(a, s)

    def from_base(self, a):
        return a


class _SymRows:
    def __init__(self, algebra: SymbolicAlgebra, is_next: bool):
        self._a = algebra
        self._next = is_next

    def __getitem__(self, col: int) -> int:
        return self._a.next(col) if self._next else self._a.local(col)

    def rng(self, a: int, b: int):
        return _SymBatch([self[c] for c in range(a, b)])


class _SymBatch(list):
    """A list of node ids standing in for a (k, M) batch."""


# batched-consumer support on the symbolic algebra: operate elementwise
def _listwise_sym(algebra, op, a, b):
    a_l, b_l = isinstance(a, list), isinstance(b, list)
    if a_l or b_l:
        if not a_l:
            a = [a] * len(b)
        if not b_l:
            b = [b] * len(a)
        return _SymBatch(op(x, y) for x, y in zip(a, b))
    return op(a, b)


class _BatchSymAlgebra(SymbolicAlgebra):
    pass


for _name in ("add", "sub", "mul"):
    def _wrap(name):
        base = getattr(SymbolicAlgebra, name)

        def fn(self, a, b):
            return _listwise_sym(self, lambda x, y: base(self, x, y), a, b)
        return fn
    setattr(_BatchSymAlgebra, _name, _wrap(_name))


def _batch_mul_const(self, a, c):
    if isinstance(a, list):
        return _SymBatch(SymbolicAlgebra.mul_const(self, x, c) for x in a)
    return SymbolicAlgebra.mul_const(self, a, c)


_BatchSymAlgebra.mul_const = _batch_mul_const


class SymConsumer:
    """Records (kind, expr) in call order; kinds pick the row selector."""
    ALL, TRANSITION, FIRST, LAST = range(4)

    def __init__(self):
        self.constraints: List[Tuple[int, int]] = []

    def constraint(self, c):
        self.constraints.append((self.ALL, c))

    def constraint_transition(self, c):
        self.constraints.append((self.TRANSITION, c))

    def constraint_first_row(self, c):
        self.constraints.append((self.FIRST, c))

    def constraint_last_row(self, c):
        self.constraints.append((self.LAST, c))

    def constraint_batch(self, values, k):
        assert len(values) == k
        for v in values:
            self.constraint(v)

    def constraint_transition_batch(self, values, k):
        for v in values:
            self.constraint_transition(v)

    def constraint_first_row_batch(self, values, k):
        for v in values:
            self.constraint_first_row(v)

    def constraint_last_row_batch(self, values, k):
        for v in values:
            self.constraint_last_row(v)


@dataclass(frozen=True)
class StarkIR:
    """Compiled constraint system: node table + ordered constraints."""
    nodes: Tuple[Tuple, ...]              # (op, a, b)
    constraints: Tuple[Tuple[int, int], ...]   # (kind, node)

    @property
    def num_constraints(self):
        return len(self.constraints)


_IR_CACHE: Dict[type, StarkIR] = {}


def compile_stark(stark) -> StarkIR:
    """Run eval_generic once symbolically; cache per stark type."""
    key = type(stark)
    ir = _IR_CACHE.get(key)
    if ir is None:
        a = _BatchSymAlgebra()
        lv = _SymRows(a, False)
        nv = _SymRows(a, True)
        consumer = SymConsumer()
        stark.eval_generic(a, lv, nv, consumer)
        ir = StarkIR(nodes=tuple(a.nodes),
                     constraints=tuple(consumer.constraints))
        _IR_CACHE[key] = ir
    return ir


def evaluate_ir(ir: StarkIR, get_local, get_next, consumers_constraint):
    """Evaluate the DAG with Goldilocks ops.

    get_local/get_next: col -> Gf (M,) value; consumers_constraint:
    (kind, Gf value) callback issued in original order."""
    vals: List = [None] * len(ir.nodes)
    live = _liveness(ir)
    for i, (op, x, y) in enumerate(ir.nodes):
        if not live[i]:
            continue
        if op == CONST:
            v = gl.full((), x)
        elif op == LOCAL:
            v = get_local(x)
        elif op == NEXT:
            v = get_next(x)
        elif op == ADD:
            v = gl.add(vals[x], vals[y])
        elif op == SUB:
            v = gl.sub(vals[x], vals[y])
        elif op == MUL:
            v = gl.mul(vals[x], vals[y])
        elif op == MULC:
            v = gl.mul(vals[x], gl.full((), y))
        elif op == ADDC:
            v = gl.add(vals[x], gl.full((), y))
        else:
            raise ValueError(op)
        vals[i] = v
    for kind, node in ir.constraints:
        consumers_constraint(kind, vals[node])


def _liveness(ir: StarkIR):
    live = [False] * len(ir.nodes)
    stack = [node for _, node in ir.constraints]
    while stack:
        i = stack.pop()
        if live[i]:
            continue
        live[i] = True
        op, x, y = ir.nodes[i]
        if op in (ADD, SUB, MUL):
            stack.append(x)
            stack.append(y)
        elif op in (MULC, ADDC):
            stack.append(x)
    return live


# ---------------------------------------------------------------------------
# Scheduled (vectorized) evaluation: the DAG is layered into levels and each
# level evaluates as a handful of whole-level Goldilocks ops over a value
# buffer — O(levels) traced JAX ops instead of O(nodes), which turns minutes
# of per-process tracing into seconds and gives XLA/TPU dense gathers +
# elementwise kernels to fuse.
# ---------------------------------------------------------------------------

import numpy as np


@dataclass(frozen=True)
class Schedule:
    """Level-ordered evaluation plan for a StarkIR."""
    n_slots: int
    const_vals: np.ndarray          # (n_consts,) uint64, slots [0, n_consts)
    local_cols: np.ndarray          # trace cols -> slots [n_consts, +n_local)
    next_cols: np.ndarray
    param_idx: np.ndarray           # param indices -> slots after next_cols
    # per level: list of (op, lhs_idx, rhs_idx_or_consts, out_start)
    levels: Tuple
    constraint_slots: np.ndarray    # (C,) slot of each constraint value
    constraint_kinds: Tuple[int, ...]


def schedule_ir(ir: StarkIR) -> Schedule:
    live = _liveness(ir)
    n = len(ir.nodes)
    level = [0] * n
    for i, (op, x, y) in enumerate(ir.nodes):
        if not live[i]:
            continue
        if op in (ADD, SUB, MUL):
            level[i] = 1 + max(level[x], level[y])
        elif op in (MULC, ADDC):
            level[i] = 1 + level[x]

    # slot assignment: consts, locals, nexts first (level 0), then levels
    slot = [-1] * n
    const_vals, local_cols, next_cols = [], [], []
    for i, (op, x, y) in enumerate(ir.nodes):
        if live[i] and op == CONST:
            slot[i] = len(const_vals)
            const_vals.append(x)
    base = len(const_vals)
    for i, (op, x, y) in enumerate(ir.nodes):
        if live[i] and op == LOCAL:
            slot[i] = base + len(local_cols)
            local_cols.append(x)
    base += len(local_cols)
    for i, (op, x, y) in enumerate(ir.nodes):
        if live[i] and op == NEXT:
            slot[i] = base + len(next_cols)
            next_cols.append(x)
    base += len(next_cols)
    param_idx = []
    for i, (op, x, y) in enumerate(ir.nodes):
        if live[i] and op == PARAM:
            slot[i] = base + len(param_idx)
            param_idx.append(x)
    base += len(param_idx)

    max_level = max(level) if n else 0
    levels = []
    for lv in range(1, max_level + 1):
        chunks = []
        for want in (ADD, SUB, MUL, MULC, ADDC):
            members = [i for i in range(n)
                       if live[i] and level[i] == lv
                       and ir.nodes[i][0] == want]
            if not members:
                continue
            out_start = base
            for i in members:
                slot[i] = base
                base += 1
            lhs = np.array([slot[ir.nodes[i][1]] for i in members],
                           dtype=np.int32)
            if want in (MULC, ADDC):
                rhs = np.array([ir.nodes[i][2] for i in members],
                               dtype=np.uint64)
            else:
                rhs = np.array([slot[ir.nodes[i][2]] for i in members],
                               dtype=np.int32)
            chunks.append((want, lhs, rhs, out_start, len(members)))
        levels.append(tuple(chunks))

    return Schedule(
        n_slots=base,
        const_vals=np.array(const_vals, dtype=np.uint64),
        local_cols=np.array(local_cols, dtype=np.int32),
        next_cols=np.array(next_cols, dtype=np.int32),
        param_idx=np.array(param_idx, dtype=np.int32),
        levels=tuple(levels),
        constraint_slots=np.array([slot[node] for _, node in ir.constraints],
                                  dtype=np.int32),
        constraint_kinds=tuple(k for k, _ in ir.constraints))


_SCHED_CACHE: Dict[type, Schedule] = {}


def stark_schedule(stark) -> Schedule:
    key = type(stark)
    s = _SCHED_CACHE.get(key)
    if s is None:
        s = schedule_ir(compile_stark(stark))
        _SCHED_CACHE[key] = s
    return s


def evaluate_scheduled(sched: Schedule, trace, trace_next, params=None):
    """trace/trace_next: (C, M) Gf pairs; params: list of () Gf scalars
    matched by PARAM index.  Returns (n_constraints, M) Gf of constraint
    values in original order."""
    import jax.numpy as jnp
    m = trace[0].shape[-1]
    consts = gl.from_u64(np.broadcast_to(
        sched.const_vals[:, None], (len(sched.const_vals), 1)).copy())
    parts_lo = [jnp.broadcast_to(consts[0], (len(sched.const_vals), m))]
    parts_hi = [jnp.broadcast_to(consts[1], (len(sched.const_vals), m))]
    parts_lo.append(trace[0][sched.local_cols])
    parts_hi.append(trace[1][sched.local_cols])
    parts_lo.append(trace_next[0][sched.next_cols])
    parts_hi.append(trace_next[1][sched.next_cols])
    if len(sched.param_idx):
        plo = jnp.stack([params[i][0] for i in sched.param_idx])
        phi = jnp.stack([params[i][1] for i in sched.param_idx])
        parts_lo.append(jnp.broadcast_to(plo[:, None],
                                         (len(sched.param_idx), m)))
        parts_hi.append(jnp.broadcast_to(phi[:, None],
                                         (len(sched.param_idx), m)))
    buf = (jnp.concatenate(parts_lo, axis=0),
           jnp.concatenate(parts_hi, axis=0))
    for chunks in sched.levels:
        outs_lo, outs_hi = [buf[0]], [buf[1]]
        for op, lhs, rhs, out_start, count in chunks:
            a = (buf[0][lhs], buf[1][lhs])
            if op in (MULC, ADDC):
                cvals = gl.from_u64(rhs[:, None].copy())
                b = (jnp.broadcast_to(cvals[0], (count, m)),
                     jnp.broadcast_to(cvals[1], (count, m)))
            else:
                b = (buf[0][rhs], buf[1][rhs])
            if op in (ADD, ADDC):
                r = gl.add(a, b)
            elif op == SUB:
                r = gl.sub(a, b)
            else:
                r = gl.mul(a, b)
            outs_lo.append(r[0])
            outs_hi.append(r[1])
        buf = (jnp.concatenate(outs_lo, axis=0),
               jnp.concatenate(outs_hi, axis=0))
    cs = sched.constraint_slots
    return (buf[0][cs], buf[1][cs])


def _pow_static(alpha, exps: np.ndarray):
    """alpha^exps for a traced () Gf scalar and STATIC integer exponents:
    square-and-multiply with static masks — O(log max_exp) vectorized muls,
    no concatenates (XLA:CPU concat-fusion hazard, see project memory)."""
    import jax.numpy as jnp
    res = gl.full(exps.shape, 1)
    sq = alpha
    for b in range(int(exps.max()).bit_length() if len(exps) else 0):
        mask = jnp.asarray(((exps >> b) & 1).astype(bool))
        mul = gl.mul(res, (jnp.broadcast_to(sq[0], res[0].shape),
                           jnp.broadcast_to(sq[1], res[0].shape)))
        res = (jnp.where(mask, mul[0], res[0]),
               jnp.where(mask, mul[1], res[1]))
        sq = gl.mul(sq, sq)
    return res


def feed_consumer(sched: Schedule, cvals, consumer):
    """Fold the whole (C, M) constraint stack into the consumer's alpha
    accumulators in ONE vectorized pass: row-kind selectors are gathered by
    the static kind array, then acc_j += sum_i alpha_j^{C-1-i} sel_i c_i —
    identical math (and transcript) to issuing the C constraints one by
    one, but O(log C) traced ops instead of O(C).  Tracing the per-batch
    path took minutes per table; this traces in milliseconds."""
    import jax.numpy as jnp
    kinds = np.array(sched.constraint_kinds, dtype=np.int64)
    c = len(kinds)
    if c == 0:
        return
    m = cvals[0].shape[-1]

    def bcast(s):
        return (jnp.broadcast_to(s[0], (m,)), jnp.broadcast_to(s[1], (m,)))

    ones = gl.full((m,), 1)
    sels = [bcast(ones), bcast(consumer.z_last),
            bcast(consumer.lagrange_first), bcast(consumer.lagrange_last)]
    sel_lo = jnp.stack([s[0] for s in sels])
    sel_hi = jnp.stack([s[1] for s in sels])
    weighted = gl.mul(cvals, (sel_lo[kinds], sel_hi[kinds]))

    exps = (c - 1 - np.arange(c)).astype(np.int64)
    for j, alpha in enumerate(consumer.alphas):
        pw = _pow_static(alpha, exps)
        term = gl.sum_axis(
            gl.mul(weighted, (pw[0][:, None], pw[1][:, None])), 0)
        alpha_c = _pow_static(alpha, np.array([c], dtype=np.int64))
        shifted = gl.mul(consumer.accs[j],
                         (alpha_c[0][0], alpha_c[1][0]))
        consumer.accs[j] = gl.add(shifted, term)
    consumer.count += c
