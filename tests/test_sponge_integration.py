"""Bootstrap/exit kernel + PoseidonSponge integration: the full 6-table
sponge subset balances every CTL and satisfies every constraint group on a
real segment witness.

Reference: cpu/bootstrap_kernel.rs:26-160, cpu/exit_kernel.rs:22-110,
all_stark.rs:166-209 (poseidon sponge/input/output CTLs) and :487-493
(sponge memory reads).
"""

import numpy as np
import pytest

from zkm_tpu.emulator.state import State
from zkm_tpu.field import goldilocks as gl
from zkm_tpu.emulator.utils import split_prog_into_segs
from zkm_tpu.stark.all_stark import SPONGE_SUBSET, Table, make_all_stark
from zkm_tpu.stark.constraint_debug import check_stark_constraints
from zkm_tpu.stark.ctl_debug import check_ctls
from zkm_tpu.tables import arithmetic as arith
from zkm_tpu.tables import logic
from zkm_tpu.tables import memory as mem
from zkm_tpu.tables import poseidon, poseidon_sponge as psponge
from zkm_tpu.tables.cpu import CpuStark, columns as cc
from zkm_tpu.witness.generation import generate_segment_traces

PROGRAM = [
    0x24080005, 0x2409000A,             # addiu t0,5 / t1,10
    0x01095020, 0x01096824,             # add t2 / and t5
    0x3508BEEF, 0x3C110001,             # ori / lui
    0xAE2A0000, 0x8E2B0000,             # sw t2 / lw t3
    0x24021096, 0x24040000, 0x0000000C,  # exit_group(0)
]

CTL_NAMES = ["arithmetic", "poseidon_sponge", "poseidon_inputs",
             "poseidon_outputs", "logic", "memory"]


def _segment():
    prog = b"".join(w.to_bytes(4, "big") for w in PROGRAM)
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    assert len(segs) == 1
    return segs[0], prog


@pytest.fixture(scope="module")
def sponge_witness():
    seg, prog = _segment()
    return seg, generate_segment_traces(seg, sponge=True)


def _table_rows(t, all_stark):
    d = {Table.Arithmetic: lambda: arith.generate_rows(t.arith_ops),
         Table.Cpu: lambda: t.cpu_rows.T.copy(),
         Table.Poseidon: lambda: np.asarray(
             gl.to_u64(poseidon.generate_trace(t.poseidon_inputs))),
         Table.PoseidonSponge: lambda: psponge.generate_rows(
             t.poseidon_sponge_ops),
         Table.Logic: lambda: logic.generate_rows(t.logic_ops),
         Table.Memory: lambda: mem.generate_rows(t.memory_ops)}
    return [d[tab]() for tab in all_stark.tables]


def test_sponge_ctl_multisets(sponge_witness):
    _, t = sponge_witness
    assert t.poseidon_sponge_ops, "sponge ops missing from witness"
    a = make_all_stark(SPONGE_SUBSET)
    check_ctls(_table_rows(t, a), a.ctls, names=CTL_NAMES)


def test_cpu_constraints_with_kernels(sponge_witness):
    _, t = sponge_witness
    check_stark_constraints(CpuStark(), t.cpu_rows.T.copy())


def test_sponge_counts(sponge_witness):
    seg, t = sponge_witness
    # bootstrap hashes every image page + image id; exit re-hashes + id
    n_pages = len({a >> 12 for a in seg.mem_image})
    n_sponge = len(t.poseidon_sponge_ops)
    assert n_sponge == 2 * (n_pages + 1)
    # every sponge op's digest permutation count matches its block count
    n_perms = sum(len(op.input) // 32 + 1 for op in t.poseidon_sponge_ops)
    assert len(t.poseidon_inputs) == n_perms


def test_tampered_image_fails_witness():
    seg, _ = _segment()
    # corrupt one byte of the pre-state image: bootstrap page-hash check
    # must refuse to build a witness
    addr = next(iter(seg.mem_image))
    seg.mem_image[addr] ^= 1
    with pytest.raises(AssertionError):
        generate_segment_traces(seg, sponge=True)
