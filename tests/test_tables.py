"""Memory and Arithmetic table tests: constraint vanishing via the prover's
check_constraints oracle, plus a full prove+verify round trip each."""

import numpy as np
import pytest

from zkm_tpu.field import goldilocks as gl
from zkm_tpu.stark.config import StarkConfig
from zkm_tpu.stark.cross_table_lookup import (CrossTableLookup,
                                              TableWithColumns)
from zkm_tpu.stark.prover import prove_with_traces
from zkm_tpu.stark.proof import MemRoots, PublicValues
from zkm_tpu.stark.verifier import verify_proof
from zkm_tpu.tables import arithmetic as arith
from zkm_tpu.tables import memory as mem


def _pv():
    return PublicValues(
        roots_before=MemRoots.from_image_id(bytes(32)),
        roots_after=MemRoots.from_image_id(bytes(range(32))),
        userdata=bytes(32))


def _self_ctl(table_idx, cols, filt):
    cols = tuple(cols)
    return CrossTableLookup(
        looking_tables=(TableWithColumns(table_idx, cols, filt),),
        looked_table=TableWithColumns(table_idx, cols, filt))


def _memory_ops():
    ops = []
    ts = 10
    # write then reads at a few addresses across segments
    for virt in (0, 4, 8, 0x100):
        ops.append(mem.MemoryOp(True, ts, False, 0, mem.SEG_CODE, virt,
                                0xDEAD0000 + virt))
        ops.append(mem.MemoryOp(True, ts + 30, True, 0, mem.SEG_CODE, virt,
                                0xDEAD0000 + virt))
        ts += 100
    # register file incl. a R0 write (coerced to 0) then read
    ops.append(mem.MemoryOp(True, 20, False, 0, mem.SEG_REGISTER_FILE, 0,
                            123456))
    ops.append(mem.MemoryOp(True, 50, True, 0, mem.SEG_REGISTER_FILE, 0, 0))
    ops.append(mem.MemoryOp(True, 21, False, 0, mem.SEG_REGISTER_FILE, 8,
                            0xCAFE))
    ops.append(mem.MemoryOp(True, 52, True, 0, mem.SEG_REGISTER_FILE, 8,
                            0xCAFE))
    # a virtual-address gap larger than max_rc to exercise fill_gaps
    ops.append(mem.MemoryOp(True, 60, False, 0, mem.SEG_KERNEL_GENERAL,
                            0x100, 7))
    ops.append(mem.MemoryOp(True, 61, False, 0, mem.SEG_KERNEL_GENERAL,
                            0, 9))
    return ops


def test_memory_prove_verify():
    trace = mem.generate_trace(_memory_ops(), min_rows=64)
    stark = mem.MemoryStark()
    config = StarkConfig.test_config()
    ctls = [_self_ctl(0, mem.ctl_data(), mem.ctl_filter())]
    proof = prove_with_traces([stark], config, [trace], ctls, _pv(),
                              debug=True)
    verify_proof([stark], proof, ctls, config)


def test_memory_bad_value_fails():
    ops = _memory_ops()
    # read a different value than written at the same address
    ops.append(mem.MemoryOp(True, 200, True, 0, mem.SEG_CODE, 4, 999))
    trace = mem.generate_trace(ops, min_rows=64)
    stark = mem.MemoryStark()
    config = StarkConfig.test_config()
    ctls = [_self_ctl(0, mem.ctl_data(), mem.ctl_filter())]
    with pytest.raises(AssertionError):
        prove_with_traces([stark], config, [trace], ctls, _pv(), debug=True)


def _arith_ops():
    rng = np.random.default_rng(0)
    ops = []
    for _ in range(20):
        a = int(rng.integers(0, 1 << 32))
        b = int(rng.integers(0, 1 << 32))
        ops.append(arith.Op(arith.IS_ADD, a, b))
        ops.append(arith.Op(arith.IS_ADDU, a, b))
        ops.append(arith.Op(arith.IS_SUB, a, b))
        ops.append(arith.Op(arith.IS_SLT, a, b))
        ops.append(arith.Op(arith.IS_SLTU, a, b))
        ops.append(arith.Op(arith.IS_MFLO, a, 0))
    ops.append(arith.Op(arith.IS_ADD, 0xFFFFFFFF, 1))
    ops.append(arith.Op(arith.IS_SUB, 0, 1))
    ops.append(arith.Op(arith.IS_SLT, 0x80000000, 0x7FFFFFFF))
    ops.append(arith.Op(arith.IS_SLT, 0x7FFFFFFF, 0x80000000))
    ops.append(arith.Op(arith.IS_SLTU, 5, 5))
    for _ in range(8):
        a = int(rng.integers(0, 1 << 32))
        b = int(rng.integers(0, 1 << 32))
        ops.append(arith.Op(arith.IS_MUL, a, b))
        ops.append(arith.Op(arith.IS_MULT, a, b))
        ops.append(arith.Op(arith.IS_MULTU, a, b))
        ops.append(arith.Op(arith.IS_LUI, a & 0xFFFF, 1 << 16))
    ops.append(arith.Op(arith.IS_MULT, 0xFFFFFFFF, 0xFFFFFFFF))
    ops.append(arith.Op(arith.IS_MULT, 0x80000000, 0x80000000))
    ops.append(arith.Op(arith.IS_MULTU, 0xFFFFFFFF, 0xFFFFFFFF))
    ops.append(arith.Op(arith.IS_MUL, 0xFFFF, 0x10001))
    ops.append(arith.Op(arith.IS_SLL, 4, 0xDEADBEEF))
    ops.append(arith.Op(arith.IS_SLL, 0, 0x12345678))
    ops.append(arith.Op(arith.IS_SLLV, 31, 0xFFFFFFFF))
    return ops


def test_arithmetic_constraints_and_proof():
    trace = arith.generate_trace(_arith_ops())
    stark = arith.ArithmeticStark()
    config = StarkConfig.test_config()
    ctls = [_self_ctl(0, arith.ctl_data(), arith.ctl_filter())]
    proof = prove_with_traces([stark], config, [trace], ctls, _pv(),
                              debug=True)
    verify_proof([stark], proof, ctls, config)


def test_arithmetic_bad_result_fails():
    ops = _arith_ops()
    ops.append(arith.Op(arith.IS_ADD, 2, 2, result=5))
    trace = arith.generate_trace(ops)
    stark = arith.ArithmeticStark()
    config = StarkConfig.test_config()
    ctls = [_self_ctl(0, arith.ctl_data(), arith.ctl_filter())]
    with pytest.raises(AssertionError):
        prove_with_traces([stark], config, [trace], ctls, _pv(), debug=True)
