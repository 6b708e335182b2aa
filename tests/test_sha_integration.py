"""SHA extend/compress syscalls end-to-end: the FULL 12-table system with
all 15 CTLs balances on a real segment witness.

Reference: all_stark.rs:136-154 (CTL list), sha_extend_sponge /
sha_compress_sponge CTLs (:210-330, 503-525), witness/operation.rs
generate_sha_extend:1184 / generate_sha_compress:1300.
"""

import numpy as np
import pytest

from zkm_tpu.emulator.state import State
from zkm_tpu.emulator.utils import split_prog_into_segs
from zkm_tpu.field import goldilocks as gl
from zkm_tpu.stark.all_stark import FULL_SUBSET, Table, make_all_stark
from zkm_tpu.stark.constraint_debug import check_stark_constraints
from zkm_tpu.stark.ctl_debug import check_ctls
from zkm_tpu.stark.stark_testing import check_stark_low_degree
from zkm_tpu.tables import arithmetic as arith
from zkm_tpu.tables import keccak as keccak_tab
from zkm_tpu.tables import keccak_sponge as ksponge
from zkm_tpu.tables import logic, memory as mem
from zkm_tpu.tables import poseidon, poseidon_sponge as psponge
from zkm_tpu.tables import sha_compress as shac
from zkm_tpu.tables import sha_compress_sponge as shacs
from zkm_tpu.tables import sha_extend as shae
from zkm_tpu.tables import sha_extend_sponge as shaes
from zkm_tpu.tables.cpu import CpuStark, columns as cc
from zkm_tpu.witness.generation import generate_segment_traces

# sha_extend(w@0x1000), sha_compress(w@0x1000, h@0x1400), exit_group(0)
PROGRAM = [
    0x3C020030, 0x34420105,              # v0 = SHA_EXTEND (0x300105)
    0x24041000, 0x24050000,              # a0 = 0x1000, a1 = 0
    0x0000000C,                          # syscall
    0x3C020001, 0x34420106,              # v0 = SHA_COMPRESS (0x010106)
    0x24041000, 0x24051400,              # a0 = w_ptr, a1 = h_ptr
    0x0000000C,                          # syscall
    0x24021096, 0x24040000, 0x0000000C,  # exit_group(0)
]

CTL_NAMES = [
    "arithmetic", "poseidon_sponge", "poseidon_inputs", "poseidon_outputs",
    "keccak_sponge", "keccak_inputs", "keccak_outputs",
    "sha_extend_sponge", "sha_extend_inputs", "sha_extend_outputs",
    "sha_compress_sponge", "sha_compress_inputs", "sha_compress_outputs",
    "logic", "memory",
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
    return seg, generate_segment_traces(seg, sponge=True, keccak=True,
                                        sha=True)


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
         Table.ShaExtend: lambda: shae.generate_rows(t.sha_extend_ops),
         Table.ShaExtendSponge: lambda: shaes.generate_rows(
             t.sha_extend_ops),
         Table.ShaCompress: lambda: shac.generate_rows(t.sha_compress_ops),
         Table.ShaCompressSponge: lambda: shacs.generate_rows(
             t.sha_compress_ops),
         Table.Logic: lambda: logic.generate_rows(t.logic_ops),
         Table.Memory: lambda: mem.generate_rows(t.memory_ops)}
    return [d[tab]() for tab in all_stark.tables]


def test_witness_ops(witness):
    _, t = witness
    assert len(t.sha_extend_ops) == 48
    assert len(t.sha_compress_ops) == 1
    op = t.sha_compress_ops[0]
    # all-zero w/hx block: final state from chaining the table's own round
    state = list(op.hx)
    for i in range(64):
        state = shac.compress_round(state, op.w[i], shac.SHA_COMPRESS_K[i])
    assert state == op.final


def test_full_15_ctl_topology(witness):
    _, t = witness
    a = make_all_stark(FULL_SUBSET)
    assert len(a.ctls) == 15
    check_ctls(_table_rows(t, a), a.ctls, names=CTL_NAMES)


def test_sha_table_constraints(witness):
    _, t = witness
    check_stark_constraints(shae.ShaExtendStark(),
                            shae.generate_rows(t.sha_extend_ops))
    check_stark_constraints(shaes.ShaExtendSpongeStark(),
                            shaes.generate_rows(t.sha_extend_ops))
    check_stark_constraints(shac.ShaCompressStark(),
                            shac.generate_rows(t.sha_compress_ops))
    check_stark_constraints(shacs.ShaCompressSpongeStark(),
                            shacs.generate_rows(t.sha_compress_ops))


def test_cpu_constraints(witness):
    _, t = witness
    check_stark_constraints(CpuStark(), t.cpu_rows.T.copy())


def test_sha_low_degrees():
    check_stark_low_degree(shae.ShaExtendStark())
    check_stark_low_degree(shaes.ShaExtendSpongeStark())
    check_stark_low_degree(shacs.ShaCompressSpongeStark())


def test_sha_compress_low_degree():
    check_stark_low_degree(shac.ShaCompressStark())


@pytest.mark.parametrize("tamper", ["extend_out", "compress_round",
                                    "digest"])
def test_tamper_breaks_proof(witness, tamper):
    _, t = witness
    a = make_all_stark(FULL_SUBSET)
    rows = _table_rows(t, a)
    if tamper == "extend_out":
        # claim a wrong w[i] on the CPU sponge row
        ci = a.tables.index(Table.Cpu)
        r = int(np.nonzero(rows[ci][cc.IS_SHA_EXTEND_SPONGE])[0][0])
        rows[ci][cc.ELEMENT_VALUE, r] ^= 1
        with pytest.raises(AssertionError):
            check_ctls(rows, a.ctls, names=CTL_NAMES)
    elif tamper == "compress_round":
        # corrupt one state bit mid-chain: in-table constraints must fail
        ti = a.tables.index(Table.ShaCompress)
        tr = rows[ti]
        tr[shac.E_BITS.start + 5, 30] ^= 1
        v = check_stark_constraints(shac.ShaCompressStark(), tr,
                                    raise_on_error=False)
        assert v, "compress tamper not detected"
    elif tamper == "digest":
        ci = a.tables.index(Table.Cpu)
        r = int(np.nonzero(rows[ci][cc.IS_SHA_COMPRESS_SPONGE])[0][0])
        rows[ci][cc.SHASH_VALUE.start + 2, r] += 1
        with pytest.raises(AssertionError):
            check_ctls(rows, a.ctls, names=CTL_NAMES)
