"""Device-transcript prove == host-transcript prove, bit for bit.

The device path (stark/device_transcript.py) reorders WHERE transcript
steps run (inside jitted dispatches, one batched fetch per table) but
must not change a single proof byte: the verifier replays the same
Fiat-Shamir discipline either way.
"""

import numpy as np
import pytest

from zkm_tpu.emulator.state import State
from zkm_tpu.emulator.utils import split_prog_into_segs
from zkm_tpu.host import prove_segment, verify_segment_receipt
from zkm_tpu.stark.all_stark import Table, make_all_stark
from zkm_tpu.stark.config import StarkConfig

SUBSET = (Table.Cpu, Table.Logic, Table.Memory)


@pytest.fixture(scope="module")
def segment():
    insns = [0x24080005, 0x2409000A, 0x01095020, 0x3508BEEF,
             0x24021096, 0x24040000, 0x0000000C]
    prog = b"".join(w.to_bytes(4, "big") for w in insns)
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    return segs[0]


def _proof_bits(proof):
    """Flatten every field that goes into serialization/verification."""
    from zkm_tpu.recursion import flatten_proof
    return flatten_proof(proof)


def test_device_transcript_matches_host(segment, monkeypatch):
    config = StarkConfig.test_config()
    all_stark = make_all_stark(SUBSET)

    monkeypatch.setenv("ZKM_DEVICE_TRANSCRIPT", "0")
    host_receipt = prove_segment(segment, config, all_stark)

    monkeypatch.setenv("ZKM_DEVICE_TRANSCRIPT", "1")
    dev_receipt = prove_segment(segment, config, all_stark)

    verify_segment_receipt(dev_receipt, config, all_stark)

    a = _proof_bits(host_receipt.proof)
    b = _proof_bits(dev_receipt.proof)
    assert len(a) == len(b)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if int(x) != int(y)]
    assert not mism, f"{len(mism)} mismatching proof elements, " \
                     f"first at {mism[:5]}"

    # per-table metadata equality too (challenger chaining)
    for pa, pb in zip(host_receipt.proof.stark_proofs,
                      dev_receipt.proof.stark_proofs):
        assert pa.init_challenger_state == pb.init_challenger_state
        assert pa.degree_bits == pb.degree_bits
        assert np.array_equal(pa.proof.opening_proof.final_poly,
                              pb.proof.opening_proof.final_poly)
        assert pa.proof.opening_proof.pow_witness == \
            pb.proof.opening_proof.pow_witness
