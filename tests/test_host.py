"""Host SDK: full ELF -> segments -> proofs -> receipt chain."""

import pytest

from zkm_tpu.emulator.state import InstrumentedState, State
from zkm_tpu.emulator.utils import split_prog_into_segs
from zkm_tpu.host import (check_receipt_chain, prove_segment,
                          verify_segment_receipt)
from zkm_tpu.stark.config import StarkConfig


def _program():
    insns = [
        0x24080005, 0x2409000A,            # li t0,5; li t1,10
        0x01095020,                        # add t2,t0,t1
        0x01096824, 0x01097025,            # and t5; or t6
        0x0109582A,                        # slt t3,t0,t1
        0x3C110001, 0xAE2A0000, 0x8E2B0000,  # lui s1; sw t2; lw t3
        0x24021096, 0x24040000, 0x0000000C,  # exit_group(0)
    ]
    return b"".join(w.to_bytes(4, "big") for w in insns)


def test_prove_program_segments():
    # explicit 4-table subset: the fast default-suite e2e prove (the
    # production default is SPONGE_SUBSET, covered by test_public_values)
    from zkm_tpu.stark.all_stark import DEFAULT_SUBSET, make_all_stark
    state = State()
    state.memory.set_memory_range(0, _program())
    total, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    assert len(segs) >= 1
    config = StarkConfig.test_config()
    all_stark = make_all_stark(DEFAULT_SUBSET)
    receipts = [prove_segment(s, config, all_stark) for s in segs]
    check_receipt_chain(receipts)
    for r in receipts:
        verify_segment_receipt(r, config, all_stark)
    assert receipts[0].pre_image_id != receipts[-1].image_id
