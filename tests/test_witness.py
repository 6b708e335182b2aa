"""Emulator -> witness -> multi-table proof integration.

Runs a real MIPS program in the emulator, extracts memory/arithmetic/logic
op logs, and proves all three tables in one AllProof (self-CTLs per table
until the CPU table provides the real cross-table links).
"""

import numpy as np
import pytest

from zkm_tpu.emulator.state import InstrumentedState, State
from zkm_tpu.stark.config import StarkConfig
from zkm_tpu.stark.cross_table_lookup import (CrossTableLookup,
                                              TableWithColumns)
from zkm_tpu.stark.prover import prove_with_traces
from zkm_tpu.stark.proof import MemRoots, PublicValues
from zkm_tpu.stark.verifier import verify_proof
from zkm_tpu.tables import arithmetic as arith
from zkm_tpu.tables import logic
from zkm_tpu.tables import memory as mem
from zkm_tpu.witness.extract import extract_witness


def _program():
    insns = [
        0x24080005,   # addiu $t0, $0, 5
        0x2409000A,   # addiu $t1, $0, 10
        0x01095020,   # add $t2, $t0, $t1
        0x01095822,   # sub $t3, $t0, $t1
        0x0109602A,   # slt $t4, $t0, $t1
        0x01096824,   # and $t5, $t0, $t1
        0x01097025,   # or $t6, $t0, $t1
        0x01097826,   # xor $t7, $t0, $t1
        0x01098027,   # nor $s0, $t0, $t1
        0x3C110001,   # lui $s1, 1
        0xAE2A0000,   # sw $t2, 0($s1)
        0x8E2B0000,   # lw $t3, 0($s1)
        0x24021096, 0x24040000, 0x0000000C,  # exit_group(0)
    ]
    return b"".join(w.to_bytes(4, "big") for w in insns)


def _self_ctl(t, cols, filt):
    cols = tuple(cols)
    return CrossTableLookup((TableWithColumns(t, cols, filt),),
                            TableWithColumns(t, cols, filt))


def test_emulator_to_three_table_proof():
    state = State()
    state.memory.set_memory_range(0, _program())
    ist = InstrumentedState(state, "")
    log = extract_witness(ist, max_steps=100)
    assert ist.state.exited
    assert log.arith_ops and log.logic_ops and log.memory_ops

    arith_trace = arith.generate_trace(log.arith_ops)
    logic_trace = logic.generate_trace(log.logic_ops, min_rows=16)
    mem_trace = mem.generate_trace(log.memory_ops, min_rows=64)

    starks = [arith.ArithmeticStark(), logic.LogicStark(), mem.MemoryStark()]
    traces = [arith_trace, logic_trace, mem_trace]
    ctls = [
        _self_ctl(0, arith.ctl_data(), arith.ctl_filter()),
        _self_ctl(1, logic.ctl_data(), logic.ctl_filter()),
        _self_ctl(2, mem.ctl_data(), mem.ctl_filter()),
    ]
    pv = PublicValues(MemRoots.from_image_id(bytes(32)),
                      MemRoots.from_image_id(bytes(32)), bytes(32))
    config = StarkConfig.test_config()
    proof = prove_with_traces(starks, config, traces, ctls, pv, debug=True)
    verify_proof(starks, proof, ctls, config)
