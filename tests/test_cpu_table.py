"""CPU table: witness generation, constraints on H, tamper detection, CTLs.

Strategy per SURVEY.md §4: per-table constraint checks on real traces +
the check_ctls multiset oracle (the reference's main table-bring-up tools,
cross_table_lookup.rs:1487-1625, prover.rs:793-910).
"""

import numpy as np
import pytest

from zkm_tpu.emulator.state import InstrumentedState, State
from zkm_tpu.emulator.utils import split_prog_into_segs
from zkm_tpu.stark.all_stark import DEFAULT_SUBSET, Table, make_all_stark
from zkm_tpu.stark.constraint_debug import check_stark_constraints
from zkm_tpu.stark.ctl_debug import check_ctls
from zkm_tpu.tables import arithmetic as arith
from zkm_tpu.tables import logic
from zkm_tpu.tables import memory as mem
from zkm_tpu.tables.cpu import CpuStark, columns as cc
from zkm_tpu.witness.generation import GenerationState, generate_segment_traces

# Exercises arith (reg+imm), logic (reg+imm), shifts, memio sub-word ops,
# branches (taken + untaken), jal + delay slot, movn, clz, seh, syscalls.
PROGRAM = [
    0x24080005, 0x2409000A,             # addiu t0,5 / t1,10
    0x01095020, 0x01095822,             # add t2 / sub t3
    0x0109602A, 0x0128682B,             # slt t4 / sltu t5
    0x01096824, 0x01097025, 0x01097826, 0x01098027,   # and/or/xor/nor
    0x3129000F, 0x3508BEEF, 0x390A00FF,               # andi/ori/xori
    0x3C110001,                         # lui s1,1
    0xAE2A0000, 0x8E2B0000,             # sw t2 / lw t3
    0xA22A0002, 0x922C0002,             # sb / lbu
    0xA62A0004, 0x962C0004, 0x862D0004, 0x822D0001,   # sh/lhu/lh/lb
    0x00084140,                         # sll t0,t0,5
    0x01284004,                         # sllv t0,t1(sa),t0
    0x01090018, 0x00006010, 0x00006812,  # mult / mfhi t4 / mflo t5
    0x0109580B,                         # movn t3,t0,t1
    0x71296820,                         # clz t5,t1
    0x7C0D7620,                         # seh t6,t5
    0x11090002, 0x00000000,             # beq t0,t1 (untaken) + nop
    0x15090001, 0x00000000,             # bne t0,t1 (taken) + delay
    0x0C000024, 0x00000000,             # jal exit + delay
    0x24021096, 0x24040000, 0x0000000C,  # exit_group(0) @ 0x90
]


def _segment():
    prog = b"".join(w.to_bytes(4, "big") for w in PROGRAM)
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    assert len(segs) == 1
    return segs[0], prog


@pytest.fixture(scope="module")
def witness():
    seg, prog = _segment()
    return seg, prog, generate_segment_traces(seg)


def test_witness_matches_emulator(witness):
    seg, prog, t = witness
    st = State()
    st.memory.set_memory_range(0, prog)
    ist = InstrumentedState(st, "")
    while not st.exited:
        ist.mips_step()
    s = GenerationState(seg)
    from zkm_tpu.witness import generation as G
    G.generate_bootstrap(s)
    step = 0
    while not (s.is_kernel and (step == seg.step or s.exited)):
        G.perform_instruction(s)
        step += 1
    assert s.regs[:32] == st.registers
    assert (s.regs[32], s.regs[33]) == (st.lo, st.hi)
    assert s.exited == st.exited


def test_cpu_constraints_on_h(witness):
    _, _, t = witness
    check_stark_constraints(CpuStark(), t.cpu_rows.T.copy())


def _table_traces(t, all_stark):
    d = {Table.Arithmetic: arith.generate_rows(t.arith_ops),
         Table.Cpu: t.cpu_rows.T.copy(),
         Table.Logic: logic.generate_rows(t.logic_ops),
         Table.Memory: mem.generate_rows(t.memory_ops)}
    return [d[tab] for tab in all_stark.tables]


def test_ctl_multisets(witness):
    _, _, t = witness
    a = make_all_stark(DEFAULT_SUBSET)
    check_ctls(_table_traces(t, a), a.ctls,
               names=["arithmetic", "logic", "memory"])


@pytest.mark.parametrize("name,col,delta", [
    ("branch_should_jump", None, None),
    ("pc_skip", None, None),
    ("misflag_as_nop", None, None),
    ("opcode_bit", None, None),
])
def test_cpu_tamper_detected(witness, name, col, delta):
    _, _, t = witness
    tr = t.cpu_rows.copy()
    if name == "branch_should_jump":
        r = int(np.nonzero(tr[:, cc.OP.branch])[0][0])
        tr[r, cc.BRANCH.should_jump] ^= 1
    elif name == "pc_skip":
        r = int(np.nonzero(tr[:, cc.OP.binary_op])[0][0])
        tr[r, cc.NEXT_PROGRAM_COUNTER] += 4
    elif name == "misflag_as_nop":
        r = int(np.nonzero(tr[:, cc.OP.binary_op])[0][0])
        tr[r, cc.OP.binary_op] = 0
        tr[r, cc.OP.nop] = 1
    elif name == "opcode_bit":
        r = int(np.nonzero(tr[:, cc.OP.binary_op])[0][0])
        tr[r, cc.OPCODE_BITS.start + 3] ^= 1
    v = check_stark_constraints(CpuStark(), tr.T.copy(),
                                raise_on_error=False)
    assert v, f"tamper '{name}' not detected"


def test_ctl_tamper_detected(witness):
    _, _, t = witness
    a = make_all_stark(DEFAULT_SUBSET)
    names = ["arithmetic", "logic", "memory"]
    # fake an execution result: CPU says the ADD produced something else
    tr = _table_traces(t, a)
    r = int(np.nonzero(tr[1][cc.OP.binary_op])[0][0])
    tr[1][cc.MEM_CHANNELS[2].value, r] ^= 1
    with pytest.raises(AssertionError):
        check_ctls(tr, a.ctls, names)
    # fake a memory value
    tr = _table_traces(t, a)
    live = np.nonzero(tr[3][mem.FILTER])[0]
    tr[3][mem.VALUE, live[7]] += 1
    with pytest.raises(AssertionError):
        check_ctls(tr, a.ctls, names)
