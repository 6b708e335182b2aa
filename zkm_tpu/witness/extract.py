"""Witness extraction: replay a segment and log per-table operations.

Reference analog: prover/src/witness/ (SURVEY.md §2.3) — the reference
re-executes each segment instruction-by-instruction, filling the CPU table
row and pushing memory/arithmetic/logic op logs.  Round-1 scope: extract the
memory, arithmetic, and logic op streams from an emulator run (the CPU
table's per-row witness lands with the CPU STARK).

Address model (witness/memory.rs): ops are (context, segment, virt);
registers live in SEG_REGISTER_FILE at virt = reg index; timestamps are
clock * NUM_CHANNELS + channel.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from ..emulator.state import InstrumentedState, State
from ..tables import arithmetic as arith
from ..tables import logic
from ..tables.memory import (MemoryOp, NUM_CHANNELS, SEG_CODE,
                             SEG_REGISTER_FILE)


@dataclass
class WitnessLog:
    memory_ops: List[MemoryOp] = field(default_factory=list)
    arith_ops: List[arith.Op] = field(default_factory=list)
    logic_ops: List[tuple] = field(default_factory=list)
    num_steps: int = 0


class _TracingMemory:
    """Proxy recording raw memory accesses with (clock, channel) stamps."""

    def __init__(self, inner, log: WitnessLog):
        self._inner = inner
        self._log = log
        self.clock = 0
        self._channel = 0

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def _stamp(self):
        ts = self.clock * NUM_CHANNELS + self._channel
        self._channel = min(self._channel + 1, NUM_CHANNELS - 1)
        return ts

    def get_memory(self, addr):
        v = self._inner.get_memory(addr)
        self._log.memory_ops.append(MemoryOp(
            True, self._stamp(), True, 0, SEG_CODE, addr, v))
        return v

    def set_memory(self, addr, v):
        self._inner.set_memory(addr, v)
        self._log.memory_ops.append(MemoryOp(
            True, self._stamp(), False, 0, SEG_CODE, addr, v & 0xFFFFFFFF))


_LOGIC_FUNS = {0x24: logic.OP_AND, 0x25: logic.OP_OR, 0x26: logic.OP_XOR,
               0x27: logic.OP_NOR}
_ARITH_FUNS = {0x20: arith.IS_ADD, 0x21: arith.IS_ADDU, 0x22: arith.IS_SUB,
               0x23: arith.IS_SUBU, 0x2A: arith.IS_SLT, 0x2B: arith.IS_SLTU}
_ARITH_IMM_OPS = {8: arith.IS_ADDI, 9: arith.IS_ADDIU, 0xA: arith.IS_SLTI,
                  0xB: arith.IS_SLTIU}
_LOGIC_IMM_OPS = {0xC: logic.OP_AND, 0xD: logic.OP_OR, 0xE: logic.OP_XOR}


def _sign_ext16(v):
    return (v | 0xFFFF0000) & 0xFFFFFFFF if v & 0x8000 else v


def extract_witness(ist: InstrumentedState, max_steps: int) -> WitnessLog:
    """Run up to max_steps instructions, logging table operations."""
    log = WitnessLog()
    s = ist.state
    tracer = _TracingMemory(s.memory, log)
    s.memory = tracer
    try:
        for step in range(max_steps):
            if s.exited:
                break
            tracer.clock = log.num_steps + 1
            tracer._channel = 0
            pc = s.pc
            insn = s.memory._inner.get_memory(pc)  # peek without logging
            opcode = insn >> 26
            fun = insn & 0x3F
            rs_v = s.registers[(insn >> 21) & 0x1F]
            rt_v = s.registers[(insn >> 16) & 0x1F]
            imm = insn & 0xFFFF
            # register reads as RegisterFile ops
            ts = tracer.clock * NUM_CHANNELS
            if opcode == 0 and fun in _LOGIC_FUNS:
                log.logic_ops.append((_LOGIC_FUNS[fun], rs_v, rt_v))
            elif opcode == 0 and fun in _ARITH_FUNS:
                flag = _ARITH_FUNS[fun]
                log.arith_ops.append(arith.Op(flag, rs_v, rt_v))
            elif opcode == 0 and fun == 0x18:
                log.arith_ops.append(arith.Op(arith.IS_MULT, rs_v, rt_v))
            elif opcode == 0 and fun == 0x19:
                log.arith_ops.append(arith.Op(arith.IS_MULTU, rs_v, rt_v))
            elif opcode == 0x1C and fun == 2:
                log.arith_ops.append(arith.Op(arith.IS_MUL, rs_v, rt_v))
            elif opcode == 0 and fun == 0:     # sll (incl. nop encodings)
                shamt = (insn >> 6) & 0x1F
                log.arith_ops.append(arith.Op(arith.IS_SLL, shamt, rt_v))
            elif opcode == 0 and fun == 4:     # sllv
                log.arith_ops.append(arith.Op(arith.IS_SLLV, rs_v, rt_v))
            elif opcode == 0xF:
                log.arith_ops.append(arith.Op(arith.IS_LUI, imm, 1 << 16))
            elif opcode in _ARITH_IMM_OPS:
                flag = _ARITH_IMM_OPS[opcode]
                log.arith_ops.append(arith.Op(flag, rs_v, _sign_ext16(imm)))
            elif opcode in _LOGIC_IMM_OPS:
                log.logic_ops.append((_LOGIC_IMM_OPS[opcode], rs_v, imm))
            ist.mips_step()
            log.num_steps += 1
    finally:
        s.memory = tracer._inner
    return log
