"""Guest SDK: assembled example guests run on the emulator with correct
committed outputs, and the sha2 guest's witness balances the full
12-table CTL topology — the SURVEY §7.6 minimum e2e slice (sha2-rust
analog) without a Rust toolchain.
"""

import hashlib

import numpy as np
import pytest

from zkm_tpu.emulator.state import State
from zkm_tpu.emulator.utils import split_prog_into_segs
from zkm_tpu.hash.keccak import keccak256
from zkm_tpu.runtime import examples
from zkm_tpu.stark.all_stark import FULL_SUBSET, make_all_stark
from zkm_tpu.stark.ctl_debug import check_ctls
from zkm_tpu.witness.generation import generate_segment_traces

INPUT = bytes(range(32))


def _run(prog: bytes, inputs=()):
    state = State()
    state.memory.set_memory_range(0, prog)
    for raw in inputs:
        state.add_input_stream_bytes(raw)
    total, segs, final = split_prog_into_segs(state, None, "",
                                              seg_size=1 << 20)
    return segs, final


def test_sha2_guest():
    segs, final = _run(examples.build_sha2_guest(), [INPUT])
    assert bytes(final.public_values_stream) == \
        hashlib.sha256(INPUT).digest()


def test_keccak_guest():
    segs, final = _run(examples.build_keccak_guest(32), [INPUT])
    assert bytes(final.public_values_stream) == keccak256(INPUT)


def test_fib_guest():
    segs, final = _run(examples.build_fib_guest(20))
    committed = int.from_bytes(bytes(final.public_values_stream), "big")
    fibs = [0, 1]
    for _ in range(20):
        fibs.append(fibs[-1] + fibs[-2])
    assert committed == fibs[20] & 0xFFFFFFFF


def test_sha2_guest_witness_full_topology():
    """The minimum e2e slice: the sha2 guest's segment witness balances
    all 15 CTLs over the 12-table system."""
    from tests.test_sha_integration import CTL_NAMES, _table_rows
    segs, _ = _run(examples.build_sha2_guest(), [INPUT])
    assert len(segs) == 1
    t = generate_segment_traces(segs[0], sponge=True, keccak=True,
                                sha=True)
    assert len(t.sha_extend_ops) == 48
    assert len(t.sha_compress_ops) == 1
    a = make_all_stark(FULL_SUBSET)
    check_ctls(_table_rows(t, a), a.ctls, names=CTL_NAMES)


def test_composition_guest():
    from zkm_tpu import receipts as rc
    claim = rc.ReceiptClaim(elf_id=b"\x07" * 32, commit=b"\x08" * 32)
    digest = rc.claim_digest(claim)
    segs, _ = _run(examples.build_composition_guest(), [digest])
    proven = rc.AssumptionReceipt(
        proven=rc.Receipt.segments(rc.InnerReceipt(segments=[],
                                                   claim=claim)))
    t = generate_segment_traces(segs[0], assumptions=[proven])
    assert t.claim_digests == [digest]
    assert t.assumptions_used[0][1] is proven


def test_memalloc_guest():
    """Memory-heavy workload (BASELINE.md mem-alloc-vec row): mmap +
    write/read-back XOR over 512 words; checks the committed accumulator
    and that the witness CTLs still balance on the widened address
    range."""
    segs, final = _run(examples.build_memalloc_guest(8, 64))
    acc = 0
    for i in range(512):
        acc ^= (i * 0x9E3779B1) & 0xFFFFFFFF
    assert int.from_bytes(bytes(final.public_values_stream), "big") == acc
    from tests.test_sha_integration import CTL_NAMES, _table_rows
    t = generate_segment_traces(segs[0], sponge=True)
    a = make_all_stark()
    check_ctls(_table_rows(t, a), a.ctls, names=CTL_NAMES)
