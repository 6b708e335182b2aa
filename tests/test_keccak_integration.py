"""Keccak syscall end-to-end witness integration: the full 8-table
keccak subset balances every CTL and satisfies every constraint group.

Reference: all_stark.rs ctl_keccak_sponge/inputs/outputs (:166-209 keccak
part), the 34 absorb-XOR logic CTLs (:348-355) and sponge memory reads
(:495-501); witness/operation.rs generate_keccak:1101.
"""

import numpy as np
import pytest

from zkm_tpu.emulator.state import State
from zkm_tpu.emulator.utils import split_prog_into_segs
from zkm_tpu.field import goldilocks as gl
from zkm_tpu.hash.keccak import keccak256
from zkm_tpu.stark.all_stark import KECCAK_SUBSET, Table, make_all_stark
from zkm_tpu.stark.constraint_debug import check_stark_constraints
from zkm_tpu.stark.ctl_debug import check_ctls
from zkm_tpu.tables import arithmetic as arith
from zkm_tpu.tables import keccak as keccak_tab
from zkm_tpu.tables import keccak_sponge as ksponge
from zkm_tpu.tables import logic, memory as mem
from zkm_tpu.tables import poseidon, poseidon_sponge as psponge
from zkm_tpu.tables.cpu import CpuStark, columns as cc
from zkm_tpu.witness.generation import generate_segment_traces

# keccak(program[0:32]) written to 0x1000, then exit_group(0)
PROGRAM = [
    0x3C020001,          # lui v0, 0x0001
    0x34420109,          # ori v0, v0, 0x0109  (KECCAK)
    0x24040000,          # addiu a0, zero, 0   (input addr)
    0x24050020,          # addiu a1, zero, 32  (len)
    0x24061000,          # addiu a2, zero, 0x1000 (out ptr)
    0x0000000C,          # syscall
    0x24021096, 0x24040000, 0x0000000C,   # exit_group(0)
]

CTL_NAMES = ["arithmetic", "poseidon_sponge", "poseidon_inputs",
             "poseidon_outputs", "keccak_sponge", "keccak_inputs",
             "keccak_outputs", "logic", "memory"]


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
    return seg, prog, generate_segment_traces(seg, sponge=True, keccak=True)


def _table_rows(t, all_stark):
    d = {Table.Arithmetic: lambda: arith.generate_rows(t.arith_ops),
         Table.Cpu: lambda: t.cpu_rows.T.copy(),
         Table.Poseidon: lambda: np.asarray(
             gl.to_u64(poseidon.generate_trace(t.poseidon_inputs))),
         Table.PoseidonSponge: lambda: psponge.generate_rows(
             t.poseidon_sponge_ops),
         Table.Keccak: lambda: keccak_tab.generate_rows(t.keccak_inputs),
         Table.KeccakSponge: lambda: ksponge.generate_rows(
             t.keccak_sponge_ops),
         Table.Logic: lambda: logic.generate_rows(t.logic_ops),
         Table.Memory: lambda: mem.generate_rows(t.memory_ops)}
    return [d[tab]() for tab in all_stark.tables]


def test_sponge_op_digest(witness):
    _, prog, t = witness
    assert len(t.keccak_sponge_ops) == 1
    op = t.keccak_sponge_ops[0]
    assert op.input == prog[:32]
    assert len(t.keccak_inputs) == 1          # 32 bytes -> one final block
    rows = ksponge.generate_rows(t.keccak_sponge_ops)
    digest = bytes(int(rows[c, 0]) for c in ksponge.UPDATED_DIGEST_BYTES)
    assert digest == keccak256(prog[:32])


def test_keccak_ctl_multisets(witness):
    _, _, t = witness
    a = make_all_stark(KECCAK_SUBSET)
    check_ctls(_table_rows(t, a), a.ctls, names=CTL_NAMES)


def test_cpu_constraints(witness):
    _, _, t = witness
    check_stark_constraints(CpuStark(), t.cpu_rows.T.copy())


def test_keccak_sponge_constraints(witness):
    _, _, t = witness
    check_stark_constraints(
        ksponge.KeccakSpongeStark(),
        ksponge.generate_rows(t.keccak_sponge_ops))


def test_tampered_digest_breaks_ctl(witness):
    _, _, t = witness
    a = make_all_stark(KECCAK_SUBSET)
    rows = _table_rows(t, a)
    ki = a.tables.index(Table.Cpu)
    r = int(np.nonzero(rows[ki][cc.IS_KECCAK_SPONGE])[0][0])
    rows[ki][cc.KHASH_VALUE.start, r] ^= 1
    with pytest.raises(AssertionError):
        check_ctls(rows, a.ctls, names=CTL_NAMES)
