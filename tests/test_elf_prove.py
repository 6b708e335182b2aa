"""Prove a real reference ELF segment (VERDICT r2 item 8).

The Go `hello` binary from the reference's test vectors
(/root/reference/emulator/test-vectors/hello, reference
emulator/src/utils.rs:23-56) exercises decode/memio/syscall breadth no
hand-assembled guest reaches: ~372k MIPS instructions over 8 segments of
65536 cycles.  The fast test checks witness + trace building at full
segment scale; the slow test proves + verifies segment 0 end-to-end.
"""

import os

import numpy as np
import pytest

from zkm_tpu.stark.all_stark import DEFAULT_SUBSET, make_all_stark
from zkm_tpu.stark.config import StarkConfig

HELLO = "/root/reference/emulator/test-vectors/hello"

pytestmark = pytest.mark.skipif(not os.path.exists(HELLO),
                                reason="reference hello ELF not available")


@pytest.fixture(scope="module")
def hello_segments():
    from zkm_tpu.emulator.utils import load_elf_with_patch, \
        split_prog_into_segs
    state = load_elf_with_patch(HELLO, ["x"], native=True)
    total, segs, _ = split_prog_into_segs(state, None, "", seg_size=65536)
    assert total > 300_000 and len(segs) >= 8
    return segs


def test_hello_segment_witness_and_tables(hello_segments):
    """Full-scale witness generation + 4-table build on a 65536-cycle
    segment of real Go code (single-digit seconds per phase on the 4-core
    host — VERDICT r2 item 9's throughput target)."""
    from zkm_tpu.host import segment_traces
    a = make_all_stark(DEFAULT_SUBSET)
    traces = segment_traces(hello_segments[0], a)
    shapes = {t.name: tr[0].shape for t, tr in zip(a.tables, traces)}
    assert shapes["Cpu"] == (260, 65536)
    assert shapes["Arithmetic"][1] == 65536
    assert shapes["Memory"][1] >= (1 << 19)


@pytest.mark.slow
def test_prove_hello_segment(hello_segments):
    """e2e proof of a real 65536-cycle Go segment (4-table subset; the
    sponge chain at this scale is the TPU bench's territory)."""
    from zkm_tpu.host import prove_segment, verify_segment_receipt
    config = StarkConfig.test_config()
    a = make_all_stark(DEFAULT_SUBSET)
    receipt = prove_segment(hello_segments[0], config, a)
    verify_segment_receipt(receipt, config, a)
    assert receipt.pre_image_id == hello_segments[0].pre_image_id


@pytest.mark.slow
def test_prove_hello_sponge_chain(hello_segments):
    """VERDICT r3 item 6: real compiled-ELF segments through the
    production SPONGE_SUBSET at standard_fast_config, >= 2 segments
    receipt-chained (pre/post image ids bound in-proof by the Poseidon
    page-hash sponge).  Sized for the TPU host (set ZKM_SLOW=1 there);
    wall-clock numbers recorded in BASELINE.md §hello-segment."""
    from zkm_tpu.host import (check_receipt_chain, prove_segment,
                              verify_segment_receipt)
    config = StarkConfig.standard_fast_config()
    a = make_all_stark()           # SPONGE_SUBSET
    r0 = prove_segment(hello_segments[0], config, a)
    r1 = prove_segment(hello_segments[1], config, a)
    for r in (r0, r1):
        verify_segment_receipt(r, config, a)
    check_receipt_chain([r0, r1])
