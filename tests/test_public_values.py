"""PublicValues constraint binding (VERDICT round-2 weak #4).

The reference only asserts image ids witness-side
(prover/src/cpu/bootstrap_kernel.rs:166-174); here the CPU table binds
PublicValues.roots_before/after as public inputs via boundary constraints
(tables/cpu/constraints.py eval_image_id_binding), so an otherwise-valid
proof with altered PublicValues fails the quotient identity at the
verifier.
"""

import numpy as np
import pytest

from zkm_tpu.emulator.state import State
from zkm_tpu.emulator.utils import split_prog_into_segs
from zkm_tpu.stark.all_stark import SPONGE_SUBSET, make_all_stark
from zkm_tpu.stark.config import StarkConfig
from zkm_tpu.stark.constraint_debug import check_stark_constraints
from zkm_tpu.stark.proof import MemRoots
from zkm_tpu.tables.cpu import CpuStarkImageBound
from zkm_tpu.witness.generation import generate_segment_traces

PROGRAM = [
    0x24080005, 0x2409000A, 0x01095020,            # li, li, add
    0x01096824, 0x01097025,                        # and, or
    0xAE2A0000, 0x8E2B0000,                        # sw, lw
    0x24021096, 0x24040000, 0x0000000C,            # exit_group(0)
]


@pytest.fixture(scope="module")
def segment():
    prog = b"".join(w.to_bytes(4, "big") for w in PROGRAM)
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    assert len(segs) == 1
    return segs[0]


def _publics(seg):
    rb = MemRoots.from_image_id(seg.pre_image_id).root
    ra = MemRoots.from_image_id(seg.image_id).root
    return list(rb) + list(ra)


def test_image_id_binding_witness_level(segment):
    t = generate_segment_traces(segment, sponge=True)
    trace = t.cpu_rows.T.copy()
    pubs = _publics(segment)
    check_stark_constraints(CpuStarkImageBound(), trace, publics=pubs)

    for word in (0, 7, 8, 15):      # roots_before + roots_after words
        bad = list(pubs)
        bad[word] = (bad[word] + 1) & 0xFFFFFFFF
        v = check_stark_constraints(CpuStarkImageBound(), trace,
                                    publics=bad, raise_on_error=False)
        assert v, f"tampered public word {word} not caught"


def test_forged_after_flag_rejected(segment):
    """A prover moving the AFTER_IMAGE_ID flip to a non-sponge row (to bind
    a junk digest) violates the flip-row pins."""
    t = generate_segment_traces(segment, sponge=True)
    from zkm_tpu.tables.cpu import columns as cc
    trace = t.cpu_rows.T.copy()
    pubs = _publics(segment)

    # move the flip one row later: the pad row is not a sponge row
    col = trace[cc.AFTER_IMAGE_ID]
    first_one = int(np.argmax(col == 1))
    forged = trace.copy()
    forged[cc.AFTER_IMAGE_ID, first_one] = 0
    v = check_stark_constraints(CpuStarkImageBound(), forged,
                                publics=pubs, raise_on_error=False)
    assert v, "shifted AFTER_IMAGE_ID flip not caught"

    # clear the flag entirely: last-row boundary fails
    forged2 = trace.copy()
    forged2[cc.AFTER_IMAGE_ID] = 0
    v2 = check_stark_constraints(CpuStarkImageBound(), forged2,
                                 publics=pubs, raise_on_error=False)
    assert v2, "cleared AFTER_IMAGE_ID not caught"


def test_sponge_proof_rejects_altered_public_values(segment):
    """e2e: prove the sponge subset, verify, then tamper the proof's
    PublicValues and check the verifier rejects (both via the transcript
    AND the in-constraint binding)."""
    from zkm_tpu.host import prove_segment, verify_segment_receipt
    from zkm_tpu.stark.verifier import verify_proof

    config = StarkConfig.test_config()
    all_stark = make_all_stark(SPONGE_SUBSET)
    receipt = prove_segment(segment, config, all_stark)
    verify_segment_receipt(receipt, config, all_stark)

    proof = receipt.proof
    good_root = list(proof.public_values.roots_after.root)
    proof.public_values.roots_after = MemRoots(
        [good_root[0] ^ 1] + good_root[1:])
    with pytest.raises(Exception):
        verify_proof(all_stark.starks, proof, all_stark.ctls, config)
    proof.public_values.roots_after = MemRoots(good_root)
    verify_proof(all_stark.starks, proof, all_stark.ctls, config)
