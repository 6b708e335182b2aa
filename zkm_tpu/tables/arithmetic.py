"""Arithmetic table: 16-bit-limb circuits for MIPS ALU operations.

Reference: /root/reference/prover/src/arithmetic/ — 27 op flags, 9*N_LIMBS
shared columns (N_LIMBS=2), a 2^16 range-check counter + frequencies, and 8
AUX_EXTRA columns; every shared column is logUp-range-checked against the
counter (arithmetic_stark.rs:123-152).

Implemented op families (round 1):
  * addcy (ADD/ADDU/ADDI/ADDIU/SUB/SUBU): X + Y = Z + CY*2^32 over limbs
    (addcy.rs).
  * slt (SLT/SLTU/SLTI/SLTIU): borrow chain with a sign-flip aux for the
    signed comparison (slt.rs).
  * lo_hi moves (MFHI/MTHI/MFLO/MTLO): input == output (lo_hi.rs).
Remaining families (MULT/MUL/DIV/shifts/SRA/LUI) follow in the next round —
flags/columns are already laid out to match the reference.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..field import goldilocks as gl
from ..stark.columns import Column, Filter
from ..stark.lookup import Lookup
from ..stark.stark import Stark

P = gl.P
LIMB_BITS = 16
N_LIMBS = 2
BASE = 1 << LIMB_BITS
# 2^-16 mod p
GOLDILOCKS_INVERSE_65536 = 18446462594437939201

# op flags (order matches arithmetic/columns.rs)
(IS_ADD, IS_ADDU, IS_ADDI, IS_ADDIU, IS_SUB, IS_SUBU, IS_MULT, IS_MULTU,
 IS_MUL, IS_DIV, IS_DIVU, IS_SLLV, IS_SRLV, IS_SRAV, IS_SLL, IS_SRL,
 IS_SRA, IS_SLT, IS_SLTU, IS_SLTI, IS_SLTIU, IS_LUI, IS_MFHI, IS_MTHI,
 IS_MFLO, IS_MTLO) = range(26)

START_SHARED_COLS = 26
NUM_SHARED_COLS = 9 * N_LIMBS
SHARED_COLS = range(START_SHARED_COLS, START_SHARED_COLS + NUM_SHARED_COLS)

def _rng(start, count):
    return range(start, start + count)

INPUT_REGISTER_0 = _rng(START_SHARED_COLS, N_LIMBS)
INPUT_REGISTER_1 = _rng(INPUT_REGISTER_0.stop, N_LIMBS)
INPUT_REGISTER_2 = _rng(INPUT_REGISTER_1.stop, N_LIMBS)
OUTPUT_REGISTER = _rng(INPUT_REGISTER_2.stop, N_LIMBS)
AUX_INPUT_REGISTER_0 = _rng(OUTPUT_REGISTER.stop, N_LIMBS)
AUX_INPUT_REGISTER_1 = _rng(AUX_INPUT_REGISTER_0.stop, N_LIMBS)
AUX_INPUT_REGISTER_2 = _rng(AUX_INPUT_REGISTER_1.stop, N_LIMBS)

RANGE_COUNTER = START_SHARED_COLS + NUM_SHARED_COLS
RC_FREQUENCIES = RANGE_COUNTER + 1
AUX_EXTRA = _rng(RC_FREQUENCIES + 1, 8)
NUM_COLUMNS = START_SHARED_COLS + NUM_SHARED_COLS + 10

RANGE_MIN_ROWS = 1 << 16   # counter must cover all 16-bit values

ADDCY_OPS = {IS_ADD, IS_ADDU, IS_ADDI, IS_ADDIU, IS_SUB, IS_SUBU}
SLT_OPS = {IS_SLT, IS_SLTU, IS_SLTI, IS_SLTIU}
LO_HI_OPS = {IS_MFHI, IS_MTHI, IS_MFLO, IS_MTLO}


def _limbs(v: int) -> Tuple[int, int]:
    return (v & 0xFFFF, (v >> 16) & 0xFFFF)


class Op:
    """One arithmetic operation: (flag, input0, input1, result)."""

    def __init__(self, flag: int, in0: int, in1: int, result: int = None):
        self.flag = flag
        self.in0 = in0 & 0xFFFFFFFF
        self.in1 = in1 & 0xFFFFFFFF
        if result is None:
            result = self._compute()
        self.result = result & 0xFFFFFFFF

    def _compute(self) -> int:
        a, b = self.in0, self.in1
        if self.flag in (IS_ADD, IS_ADDU, IS_ADDI, IS_ADDIU):
            return (a + b) & 0xFFFFFFFF
        if self.flag in (IS_SUB, IS_SUBU):
            return (a - b) & 0xFFFFFFFF
        if self.flag in (IS_SLTU, IS_SLTIU):
            return int(a < b)
        if self.flag in (IS_SLT, IS_SLTI):
            sa = a - (1 << 32) if a >> 31 else a
            sb = b - (1 << 32) if b >> 31 else b
            return int(sa < sb)
        if self.flag in LO_HI_OPS:
            return a
        raise NotImplementedError(f"op flag {self.flag}")


def generate_trace(ops: Sequence[Op], min_rows: int = RANGE_MIN_ROWS) -> gl.Gf:
    n = max(len(ops), min_rows, 2)
    n = 1 << (n - 1).bit_length()
    rows = np.zeros((n, NUM_COLUMNS), dtype=np.uint64)
    for r, op in enumerate(ops):
        rows[r, op.flag] = 1
        a, b, c = op.in0, op.in1, op.result
        rows[r, INPUT_REGISTER_0.start:INPUT_REGISTER_0.stop] = _limbs(a)
        if op.flag in ADDCY_OPS:
            rows[r, INPUT_REGISTER_1.start:INPUT_REGISTER_1.stop] = _limbs(b)
            rows[r, OUTPUT_REGISTER.start:OUTPUT_REGISTER.stop] = _limbs(c)
            if op.flag in (IS_SUB, IS_SUBU):
                cy = int(a < b)
            else:
                cy = int(a + b >= (1 << 32))
            rows[r, AUX_INPUT_REGISTER_0.start:AUX_INPUT_REGISTER_0.stop] = \
                _limbs(cy)
        elif op.flag in SLT_OPS:
            rows[r, INPUT_REGISTER_1.start:INPUT_REGISTER_1.stop] = _limbs(b)
            diff = (a - b) & 0xFFFFFFFF
            cy = int(a < b)
            cy_val = cy
            if op.flag in (IS_SLT, IS_SLTI) and (a >> 31) != (b >> 31):
                cy_val = (1 << 16) | (1 - cy)
            rows[r, AUX_INPUT_REGISTER_0.start:AUX_INPUT_REGISTER_0.stop] = \
                _limbs(diff)
            rows[r, AUX_INPUT_REGISTER_1.start:AUX_INPUT_REGISTER_1.stop] = \
                _limbs(cy_val)
            rows[r, OUTPUT_REGISTER.start:OUTPUT_REGISTER.stop] = _limbs(c)
        elif op.flag in LO_HI_OPS:
            rows[r, OUTPUT_REGISTER.start:OUTPUT_REGISTER.stop] = _limbs(c)
        else:
            raise NotImplementedError(f"op flag {op.flag}")
    # range-check columns: counter = min(i, 2^16-1); every shared-col value
    # counts into the frequencies at its own row index.
    assert n >= RANGE_MIN_ROWS, "arithmetic trace must cover the 2^16 counter"
    rows[:, RANGE_COUNTER] = np.minimum(
        np.arange(n, dtype=np.uint64), (1 << 16) - 1)
    shared = rows[:, SHARED_COLS.start:SHARED_COLS.stop].ravel()
    assert shared.max(initial=0) < (1 << 16), "shared column out of range"
    freq = np.bincount(shared.astype(np.int64), minlength=n)
    rows[:, RC_FREQUENCIES] = freq.astype(np.uint64)
    return gl.from_u64(rows.T.copy())


def ctl_filter() -> Filter:
    """Any arithmetic op row (sum of all flags)."""
    return Filter.new_simple(Column.sum_cols(range(26)))


def ctl_data() -> List[Column]:
    """CPU-side CTL: opcode-combo column + inputs + output (packed u32s).

    Mirrors arithmetic_stark.rs ctl_arithmetic_rows: the first column
    reconstructs opcode<<6|func per flag; operands are le-limb packed."""
    op_consts = {
        IS_ADD: 0b100000, IS_ADDU: 0b100001, IS_SUB: 0b100010,
        IS_SUBU: 0b100011, IS_SLT: 0b101010, IS_SLTU: 0b101011,
        IS_MFHI: 0b010000, IS_MTHI: 0b010001, IS_MFLO: 0b010010,
        IS_MTLO: 0b010011,
    }
    combo = Column.linear_combination(
        [(flag, const) for flag, const in op_consts.items()])
    cols = [combo]
    for reg in (INPUT_REGISTER_0, INPUT_REGISTER_1, INPUT_REGISTER_2,
                OUTPUT_REGISTER):
        cols.append(Column.linear_combination(
            [(c, 1 << (LIMB_BITS * i)) for i, c in enumerate(reg)]))
    return cols


class ArithmeticStark(Stark):
    num_columns = NUM_COLUMNS

    def lookups(self):
        return [Lookup(
            columns=tuple(Column.single(c) for c in SHARED_COLS),
            table_column=Column.single(RANGE_COUNTER),
            frequencies_column=Column.single(RC_FREQUENCIES),
            filter_columns=(None,) * NUM_SHARED_COLS)]

    def eval_generic(self, a, lv, nv, consumer):
        one = a.one
        # range counter: starts at 0, increments by 0 or 1, ends at 2^16-1
        rc = lv[RANGE_COUNTER]
        n_rc = nv[RANGE_COUNTER]
        delta = a.sub(n_rc, rc)
        consumer.constraint_first_row(rc)
        consumer.constraint_transition(a.mul(delta, a.sub(delta, one)))
        consumer.constraint_last_row(a.sub(rc, a.constant((1 << 16) - 1)))

        self._eval_addcy(a, lv, consumer)
        self._eval_slt(a, lv, consumer)
        self._eval_lo_hi(a, lv, consumer)

    # -- addcy: X + Y == Z + CY * 2^32 --------------------------------------

    def _addcy_chain(self, a, consumer, filt, x, y, z, given_cy,
                     check_cy_bit=True):
        overflow = a.constant(BASE)
        cy = a.zero
        for xi, yi, zi in zip(x, y, z):
            t = a.sub(a.add(a.add(cy, xi), yi), zi)
            consumer.constraint(
                a.mul(filt, a.mul(t, a.sub(overflow, t))))
            cy = a.mul_const(t, GOLDILOCKS_INVERSE_65536)
        if check_cy_bit:
            consumer.constraint(
                a.mul(filt, a.mul(given_cy[0], a.sub(given_cy[0], a.one))))
        consumer.constraint(a.mul(filt, a.sub(cy, given_cy[0])))
        for g in given_cy[1:]:
            consumer.constraint(a.mul(filt, g))

    def _eval_addcy(self, a, lv, consumer):
        in0 = [lv[c] for c in INPUT_REGISTER_0]
        in1 = [lv[c] for c in INPUT_REGISTER_1]
        out = [lv[c] for c in OUTPUT_REGISTER]
        aux = [lv[c] for c in AUX_INPUT_REGISTER_0]
        is_add = a.add(a.add(lv[IS_ADD], lv[IS_ADDI]),
                       a.add(lv[IS_ADDU], lv[IS_ADDIU]))
        is_sub = a.add(lv[IS_SUB], lv[IS_SUBU])
        self._addcy_chain(a, consumer, is_add, in0, in1, out, aux)
        # SUB: out + in1 = in0 + cy*2^32
        self._addcy_chain(a, consumer, is_sub, in1, out, in0, aux)

    # -- slt: borrow chain with sign handling (slt.rs) ----------------------

    def _eval_slt(self, a, lv, consumer):
        one = a.one
        is_lt = a.add(a.add(lv[IS_SLT], lv[IS_SLTU]),
                      a.add(lv[IS_SLTI], lv[IS_SLTIU]))
        sign = a.add(lv[IS_SLT], lv[IS_SLTI])
        x = [lv[c] for c in INPUT_REGISTER_1]      # right
        y = [lv[c] for c in AUX_INPUT_REGISTER_0]  # diff = left - right
        z = [lv[c] for c in INPUT_REGISTER_0]      # left
        given_cy = [lv[c] for c in AUX_INPUT_REGISTER_1]
        rd = [lv[c] for c in OUTPUT_REGISTER]

        overflow = a.constant(BASE)
        cy = a.zero
        for xi, yi, zi in zip(x, y, z):
            t = a.sub(a.add(a.add(cy, xi), yi), zi)
            consumer.constraint(
                a.mul(is_lt, a.mul(t, a.sub(overflow, t))))
            cy = a.mul_const(t, GOLDILOCKS_INVERSE_65536)

        consumer.constraint(
            a.mul(is_lt, a.mul(given_cy[0], a.sub(given_cy[0], one))))
        consumer.constraint(
            a.mul(is_lt, a.mul(a.sub(cy, given_cy[0]), a.sub(one, sign))))
        consumer.constraint(
            a.mul(is_lt, a.mul(given_cy[1],
                               a.sub(a.sub(one, cy), given_cy[0]))))
        consumer.constraint_transition(
            a.mul(is_lt, a.sub(rd[0], given_cy[0])))
        for i in range(1, N_LIMBS):
            consumer.constraint(
                a.mul(is_lt, a.mul(given_cy[i], a.sub(one, sign))))
            consumer.constraint_transition(a.mul(is_lt, rd[i]))

    # -- lo/hi moves --------------------------------------------------------

    def _eval_lo_hi(self, a, lv, consumer):
        filt = a.add(a.add(lv[IS_MFHI], lv[IS_MTHI]),
                     a.add(lv[IS_MFLO], lv[IS_MTLO]))
        for ci, co in zip(INPUT_REGISTER_0, OUTPUT_REGISTER):
            consumer.constraint(a.mul(filt, a.sub(lv[ci], lv[co])))
