"""Full 12-table system proofs (VERDICT round-2 item 2).

Round 2 only ever witness-checked the full system (check_ctls /
check_constraints); these tests actually prove + verify it, converting
"implemented" into "proven".  Reference: prover/src/prover.rs:130-232
proves all 12 tables on every segment.

Heavy (many-minute, 12-table compile volume) — slow-marked; the witness-
level topology check stays fast and always runs.
"""

import pytest

from zkm_tpu.emulator.state import State
from zkm_tpu.emulator.utils import split_prog_into_segs
from zkm_tpu.runtime import guest
from zkm_tpu.runtime.asm import Asm
from zkm_tpu.stark.all_stark import FULL_SUBSET, make_all_stark
from zkm_tpu.stark.config import StarkConfig

W_PTR = 0x1000
H_PTR = 0x1400
K_IN = 0x2000
K_OUT = 0x2400


def build_full_guest() -> bytes:
    """A guest touching every table family: arithmetic (add/sub/mult/div),
    logic (and/or/xor), memory (sw/lw), sha_extend + sha_compress, keccak,
    and the poseidon sponge chain via bootstrap/exit page hashing."""
    a = Asm()
    a.li("t0", 5)
    a.li("t1", 10)
    a.add("t2", "t0", "t1")
    a.and_("t3", "t0", "t1")
    a.or_("t4", "t0", "t1")
    a.xor("t5", "t2", "t4")
    a.sw("t2", 0x3000, "zero")
    a.lw("t6", 0x3000, "zero")
    guest.sha_extend(a, W_PTR)
    guest.sha_compress(a, W_PTR, H_PTR)
    guest.keccak(a, K_IN, 32, K_OUT)
    guest.halt(a, 0)
    return a.assemble()


@pytest.fixture(scope="module")
def segment():
    prog = build_full_guest()
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    assert len(segs) == 1
    return segs[0]


def test_full_witness_balances(segment):
    """Fast sanity: the full guest's witness balances all 15 CTLs."""
    from zkm_tpu.stark.ctl_debug import check_ctls
    from zkm_tpu.host import segment_traces
    from zkm_tpu.field import goldilocks as gl
    import numpy as np

    a = make_all_stark(FULL_SUBSET)
    assert len(a.ctls) == 15 and a.num_tables == 12
    traces = segment_traces(segment, a)
    raw = [np.asarray(gl.to_u64(t)) for t in traces]
    check_ctls(raw, a.ctls)


@pytest.mark.slow
def test_prove_full_12_table_system(segment):
    """Prove + verify the FULL 12-table system on a real segment whose
    witness populates every table family."""
    from zkm_tpu.host import prove_segment, verify_segment_receipt

    config = StarkConfig.test_config()
    all_stark = make_all_stark(FULL_SUBSET)
    receipt = prove_segment(segment, config, all_stark)
    verify_segment_receipt(receipt, config, all_stark)
