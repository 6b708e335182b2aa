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

# mul/mult column aliases (overlapping shared-col reuse, columns.rs)
MUL_AUX_INPUT_LO = AUX_INPUT_REGISTER_0
MUL_AUX_INPUT_HI = AUX_INPUT_REGISTER_1
OUTPUT_REGISTER_LO = OUTPUT_REGISTER
OUTPUT_REGISTER_HI = _rng(OUTPUT_REGISTER.stop, N_LIMBS)
MULT_AUX_LO = _rng(OUTPUT_REGISTER_HI.stop, 2 * N_LIMBS)
MULT_AUX_HI = _rng(MULT_AUX_LO.stop, 2 * N_LIMBS)
AUX_COEFF_ABS_MAX = 1 << 20

ADDCY_OPS = {IS_ADD, IS_ADDU, IS_ADDI, IS_ADDIU, IS_SUB, IS_SUBU}
SLT_OPS = {IS_SLT, IS_SLTU, IS_SLTI, IS_SLTIU}
LO_HI_OPS = {IS_MFHI, IS_MTHI, IS_MFLO, IS_MTLO}
MUL_OPS = {IS_MUL, IS_LUI}
MULT_OPS = {IS_MULT, IS_MULTU}
SLL_OPS = {IS_SLL, IS_SLLV}
SRL_OPS = {IS_SRL, IS_SRLV}
SRA_OPS = {IS_SRA, IS_SRAV}
DIV_OPS = {IS_DIV, IS_DIVU}
HILO_RESULT_OPS = MULT_OPS | DIV_OPS   # 64-bit (hi:lo) results


def _limbs(v: int) -> Tuple[int, int]:
    return (v & 0xFFFF, (v >> 16) & 0xFFFF)


class Op:
    """One arithmetic operation: (flag, input0, input1, result).

    For MULT/MULTU `result` is the 64-bit hi:lo accumulator."""

    def __init__(self, flag: int, in0: int, in1: int, result: int = None):
        self.flag = flag
        self.in0 = in0 & 0xFFFFFFFF
        self.in1 = in1 & 0xFFFFFFFF
        if result is None:
            result = self._compute()
        mask = 0xFFFFFFFFFFFFFFFF if flag in HILO_RESULT_OPS else 0xFFFFFFFF
        self.result = result & mask

    def lo_hi(self) -> Tuple[int, int]:
        """(lo, hi) halves of a 64-bit MULT/MULTU/DIV/DIVU result."""
        return self.result & 0xFFFFFFFF, self.result >> 32

    def num_rows(self) -> int:
        """DIV and the right-shift families use a second witness row."""
        return 2 if self.flag in (DIV_OPS | SRL_OPS | SRA_OPS) else 1

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
        if self.flag == IS_MUL:
            return (a * b) & 0xFFFFFFFF
        if self.flag == IS_LUI:
            return (a << 16) & 0xFFFFFFFF
        if self.flag == IS_MULTU:
            return a * b
        if self.flag == IS_MULT:
            sa = a - (1 << 32) if a >> 31 else a
            sb = b - (1 << 32) if b >> 31 else b
            return (sa * sb) & 0xFFFFFFFFFFFFFFFF
        if self.flag in SLL_OPS:
            # in0 = shift amount, in1 = value
            return (b << (a & 0x1F)) & 0xFFFFFFFF
        if self.flag in SRL_OPS:
            return b >> (a & 0x1F)
        if self.flag in SRA_OPS:
            sh = a & 0x1F
            sb = b - (1 << 32) if b >> 31 else b
            return (sb >> sh) & 0xFFFFFFFF
        if self.flag == IS_DIVU:
            # emulator divu: D == 0 -> (lo, hi) = (0, N)
            if b:
                q, r = a // b, a % b
            else:
                q, r = 0, a
            return (r << 32) | q
        if self.flag == IS_DIV:
            sa = a - (1 << 32) if a >> 31 else a
            sb = b - (1 << 32) if b >> 31 else b
            if sb:
                q = abs(sa) // abs(sb)
                if (sa < 0) != (sb < 0):
                    q = -q
                r = sa - q * sb
            else:
                q, r = 0, sa
            return ((r & 0xFFFFFFFF) << 32) | (q & 0xFFFFFFFF)
        raise NotImplementedError(f"op flag {self.flag}")


def _pol_mul_lo(a: List[int], b: List[int]) -> List[int]:
    n = len(a)
    return [sum(a[i] * b[d - i] for i in range(d + 1)) for d in range(n)]


def _carry_propagate(unreduced: List[int]):
    """Returns (output 16-bit limbs, final carry)."""
    out, cy = [], 0
    for u in unreduced:
        t = u + cy
        cy = t >> LIMB_BITS
        out.append(t & 0xFFFF)
    return out, cy


def _aux_limbs(unreduced: List[int], out: List[int], cy: int) -> List[int]:
    """pol_remove_root_2exp of (unreduced - out), last limb = -cy."""
    d = [u - o for u, o in zip(unreduced, out)]
    n = len(d)
    q = [0] * n
    q[0] = -(d[0] >> LIMB_BITS)
    for i in range(1, n - 1):
        q[i] = (q[i - 1] - d[i]) >> LIMB_BITS
    q[n - 1] = -cy
    return q


def _store_aux(row, q: List[int], lo_range, hi_range):
    for i, c in enumerate(q):
        v = c + AUX_COEFF_ABS_MAX
        assert 0 <= v <= (1 << 21)
        row[lo_range.start + i] = v & 0xFFFF
        row[hi_range.start + i] = v >> 16


def _gen_mul_row(row, a_limbs: List[int], b_limbs: List[int]):
    """MUL / LUI: low-32 product with aux witness (mul.rs generate_mul)."""
    unreduced = _pol_mul_lo(a_limbs, b_limbs)
    out, cy = _carry_propagate(unreduced)
    row[OUTPUT_REGISTER.start:OUTPUT_REGISTER.stop] = out
    q = _aux_limbs(unreduced, out, cy)
    _store_aux(row, q, MUL_AUX_INPUT_LO, MUL_AUX_INPUT_HI)


def _gen_mult_row(row, flag: int, a: int, b: int):
    """MULT / MULTU: 64-bit product into hi:lo (mult.rs)."""
    a_l = list(_limbs(a))
    b_l = list(_limbs(b))
    if flag == IS_MULT:
        a_neg = bool(a >> 31)
        b_neg = bool(b >> 31)
        row[AUX_EXTRA.start] = int(a_neg)
        row[AUX_EXTRA.start + 1] = int(b_neg)
        row[INPUT_REGISTER_2.start] = (a >> 16) ^ 0x8000
        row[INPUT_REGISTER_2.start + 1] = (b >> 16) ^ 0x8000
        pad_a = [0xFFFF] * N_LIMBS if a_neg else [0] * N_LIMBS
        pad_b = [0xFFFF] * N_LIMBS if b_neg else [0] * N_LIMBS
        left = a_l + pad_a
        right = b_l + pad_b
    else:
        left = a_l + [0] * N_LIMBS
        right = b_l + [0] * N_LIMBS
    unreduced = _pol_mul_lo(left, right)
    out, cy = _carry_propagate(unreduced)
    row[OUTPUT_REGISTER_LO.start:OUTPUT_REGISTER_LO.stop] = out[:N_LIMBS]
    row[OUTPUT_REGISTER_HI.start:OUTPUT_REGISTER_HI.stop] = out[N_LIMBS:]
    q = _aux_limbs(unreduced, out, cy)
    _store_aux(row, q, MULT_AUX_LO, MULT_AUX_HI)


def generate_trace(ops: Sequence[Op], min_rows: int = RANGE_MIN_ROWS) -> gl.Gf:
    return gl.from_u64(generate_rows(ops, min_rows))


def generate_rows(ops: Sequence[Op],
                  min_rows: int = RANGE_MIN_ROWS) -> np.ndarray:
    n = max(sum(op.num_rows() for op in ops), min_rows, 2)
    n = 1 << (n - 1).bit_length()
    rows = np.zeros((n, NUM_COLUMNS), dtype=np.uint64)
    r = 0
    for op in ops:
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
        elif op.flag in MUL_OPS:
            b_eff = b if op.flag == IS_MUL else (1 << 16)
            rows[r, INPUT_REGISTER_1.start:INPUT_REGISTER_1.stop] = \
                _limbs(b_eff)
            _gen_mul_row(rows[r], list(_limbs(a)), list(_limbs(b_eff)))
        elif op.flag in MULT_OPS:
            rows[r, INPUT_REGISTER_1.start:INPUT_REGISTER_1.stop] = _limbs(b)
            _gen_mult_row(rows[r], op.flag, a, b)
        elif op.flag in SLL_OPS:
            # in0 = shift, in1 = value, in2 = 1 << shift; mul(in1, in2)
            disp = 1 << (a & 0x1F)
            rows[r, INPUT_REGISTER_1.start:INPUT_REGISTER_1.stop] = _limbs(b)
            rows[r, INPUT_REGISTER_2.start:INPUT_REGISTER_2.stop] = \
                _limbs(disp)
            _gen_mul_row(rows[r], list(_limbs(b)), list(_limbs(disp)))
        elif op.flag in DIV_OPS or op.flag in SRL_OPS or op.flag in SRA_OPS:
            _gen_div_family_rows(rows, r, op)
        else:
            raise NotImplementedError(f"op flag {op.flag}")
        r += op.num_rows()
    # range-check columns: counter = min(i, 2^16-1); every shared-col value
    # counts into the frequencies at its own row index.
    assert n >= RANGE_MIN_ROWS, "arithmetic trace must cover the 2^16 counter"
    rows[:, RANGE_COUNTER] = np.minimum(
        np.arange(n, dtype=np.uint64), (1 << 16) - 1)
    shared = rows[:, SHARED_COLS.start:SHARED_COLS.stop].ravel()
    assert shared.max(initial=0) < (1 << 16), "shared column out of range"
    freq = np.bincount(shared.astype(np.int64), minlength=n)
    rows[:, RC_FREQUENCIES] = freq.astype(np.uint64)
    return rows.T.copy()


def _gen_div_family_rows(rows, r, op):
    """DIV/DIVU and SRL/SRA families: two-row ops (milestone 3)."""
    raise NotImplementedError(f"div/right-shift rows pending (flag {op.flag})")


def ctl_filter() -> Filter:
    """Any arithmetic op row (sum of all flags)."""
    return Filter.new_simple(Column.sum_cols(range(26)))


# Per-flag opcode constants exactly as the CPU reconstructs them
# (arithmetic_stark.rs:66-94 COMBINED_OPS): R-type ops are func<<6, imm ops
# are the bare opcode, MUL is opcode|func<<6.
CTL_OP_CONSTS = {
    IS_ADD: 0b100000 << 6, IS_ADDU: 0b100001 << 6, IS_ADDI: 0b001000,
    IS_ADDIU: 0b001001, IS_SUB: 0b100010 << 6, IS_SUBU: 0b100011 << 6,
    IS_MULT: 0b011000 << 6, IS_MULTU: 0b011001 << 6,
    IS_MUL: 0b011100 + (0b000010 << 6), IS_DIV: 0b011010 << 6,
    IS_DIVU: 0b011011 << 6, IS_SLLV: 0b000100 << 6, IS_SRLV: 0b000110 << 6,
    IS_SRAV: 0b000111 << 6, IS_SLL: 0, IS_SRL: 0b000010 << 6,
    IS_SRA: 0b000011 << 6, IS_SLT: 0b101010 << 6, IS_SLTU: 0b101011 << 6,
    IS_SLTI: 0b001010, IS_SLTIU: 0b001011, IS_LUI: 0b001111,
    IS_MFHI: 0b010000 << 6, IS_MTHI: 0b010001 << 6, IS_MFLO: 0b010010 << 6,
    IS_MTLO: 0b010011 << 6,
}


def ctl_data() -> List[Column]:
    """Looked-side CTL: opcode-combo column + IN0 + IN1 + OUT (packed u32s).

    Mirrors arithmetic_stark.rs ctl_arithmetic_rows: the first column pins
    the per-flag opcode<<6|func constant; operands are le-limb packed."""
    combo = Column.linear_combination(
        [(flag, const) for flag, const in CTL_OP_CONSTS.items()
         if const != 0])
    cols = [combo]
    for reg in (INPUT_REGISTER_0, INPUT_REGISTER_1, OUTPUT_REGISTER):
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
        self._eval_mul_family(a, lv, consumer)
        self._eval_mult_family(a, lv, consumer)

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

    # -- mul family: c(x) == a(x)b(x) - (x - beta) s(x)  (mul.rs) ----------

    def _aux_from_cols(self, a, lv, lo_range, hi_range, count):
        return [a.sub(a.add(lv[lo_range.start + i],
                            a.mul_const(lv[hi_range.start + i], BASE)),
                      a.constant(AUX_COEFF_ABS_MAX))
                for i in range(count)]

    def _eval_product_check(self, a, consumer, filt, left, right, out, aux):
        """pol_mul_lo(left,right) - out - (x - beta)*aux == 0 coeff-wise."""
        n = len(left)
        for d in range(n):
            acc = a.zero
            for i in range(d + 1):
                acc = a.add(acc, a.mul(left[i], right[d - i]))
            acc = a.sub(acc, out[d])
            if d == 0:
                adjoin = a.mul_const(aux[0], P - BASE)
            else:
                adjoin = a.sub(aux[d - 1], a.mul_const(aux[d], BASE))
            acc = a.sub(acc, adjoin)
            consumer.constraint(a.mul(filt, acc))

    def _eval_mul_family(self, a, lv, consumer):
        left = [lv[c] for c in INPUT_REGISTER_0]
        right = [lv[c] for c in INPUT_REGISTER_1]
        out = [lv[c] for c in OUTPUT_REGISTER]
        aux = self._aux_from_cols(a, lv, MUL_AUX_INPUT_LO, MUL_AUX_INPUT_HI,
                                  N_LIMBS)
        for flag in (IS_MUL, IS_LUI):
            self._eval_product_check(a, consumer, lv[flag], left, right,
                                     out, aux)
        # SLL(V): value (IN1) * shifted displacement (IN2) via the same aux
        sll = a.add(lv[IS_SLL], lv[IS_SLLV])
        in2 = [lv[c] for c in INPUT_REGISTER_2]
        self._eval_product_check(a, consumer, sll, right, in2, out, aux)

    # -- mult family: 64-bit product into hi:lo (mult.rs) -------------------

    def _eval_mult_family(self, a, lv, consumer):
        one = a.one
        in0 = [lv[c] for c in INPUT_REGISTER_0]
        in1 = [lv[c] for c in INPUT_REGISTER_1]
        out = [lv[c] for c in OUTPUT_REGISTER_LO] + \
            [lv[c] for c in OUTPUT_REGISTER_HI]
        aux = self._aux_from_cols(a, lv, MULT_AUX_LO, MULT_AUX_HI,
                                  2 * N_LIMBS)

        # MULT (signed): witness sign bits + range-checked sum columns
        filt = lv[IS_MULT]

        def sign_extend(is_neg_col, sum_col, limbs):
            is_neg = lv[is_neg_col]
            consumer.constraint(a.mul(filt, a.mul(is_neg, a.sub(one, is_neg))))
            s = lv[sum_col]
            hi = limbs[N_LIMBS - 1]
            consumer.constraint(a.mul(filt, a.sub(
                a.add(hi, a.constant(1 << (LIMB_BITS - 1))),
                a.add(s, a.mul_const(is_neg, BASE)))))
            pad = a.mul_const(is_neg, 0xFFFF)
            return limbs + [pad] * N_LIMBS

        left = sign_extend(AUX_EXTRA.start, INPUT_REGISTER_2.start, in0)
        right = sign_extend(AUX_EXTRA.start + 1, INPUT_REGISTER_2.start + 1,
                            in1)
        self._eval_product_check(a, consumer, filt, left, right, out, aux)

        # MULTU (unsigned): zero-extended inputs
        z = a.zero
        self._eval_product_check(a, consumer, lv[IS_MULTU],
                                 in0 + [z] * N_LIMBS, in1 + [z] * N_LIMBS,
                                 out, aux)

    # -- lo/hi moves --------------------------------------------------------

    def _eval_lo_hi(self, a, lv, consumer):
        filt = a.add(a.add(lv[IS_MFHI], lv[IS_MTHI]),
                     a.add(lv[IS_MFLO], lv[IS_MTLO]))
        for ci, co in zip(INPUT_REGISTER_0, OUTPUT_REGISTER):
            consumer.constraint(a.mul(filt, a.sub(lv[ci], lv[co])))
