"""Byte-equality against the committed golden vectors
(tests/data/golden_vectors.json, written by scripts/freeze_vectors.py).

Freezes the framework's transcript (SURVEY §8 bit-exactness checklist):
Poseidon permutation + pad10*1 sponge, challenger duplex schedule, and a
whole single-table proof under test_config.  A mismatch means the
transcript drifted — either revert, or bump the vector file's version
with a documented protocol change (recursion circuits and exported proofs
key on this transcript)."""

import hashlib
import json
import os

import numpy as np
import pytest

VEC_PATH = os.path.join(os.path.dirname(__file__), "data",
                        "golden_vectors.json")


@pytest.fixture(scope="module")
def vectors():
    with open(VEC_PATH) as f:
        return json.load(f)


def test_poseidon_permutation_vectors(vectors):
    from zkm_tpu.hash import poseidon as ps
    for case in vectors["poseidon_permute"]:
        out = ps.permute_host([int(x) for x in case["input"]])
        assert [str(int(x)) for x in out] == case["output"]


def test_poseidon_byte_sponge_vectors(vectors):
    from zkm_tpu.hash import poseidon as ps
    for case in vectors["poseidon_bytes"]:
        data = bytes.fromhex(case["bytes_hex"])
        assert len(data) == case["len"]
        digest = ps.poseidon_bytes(data)
        assert [str(int(x)) for x in digest] == case["digest"]


def test_challenger_vectors(vectors):
    from zkm_tpu.iop.challenger import Challenger
    v = vectors["challenger"]
    ch = Challenger()
    ch.observe_elements([1, 2, 3])
    assert [str(ch.get_challenge()) for _ in range(3)] == \
        v["after_observe_1_2_3"]
    ch.observe_cap([[5, 6, 7, 8], [9, 10, 11, 12]])
    assert [str(x) for x in ch.get_extension_challenge()] == \
        v["ext_after_cap"]
    assert [str(x) for x in ch.get_n_challenges(4)] == v["n_challenges"]
    assert [str(x) for x in ch.compact()] == v["compact_state"]


def test_frozen_logic_proof(vectors):
    """Re-prove the frozen Logic-table statement and compare the WHOLE
    proof byte-for-byte (trace cap inline; full flattening by sha256)."""
    from zkm_tpu.recursion import flatten_proof
    from zkm_tpu.stark.config import StarkConfig
    from zkm_tpu.stark.cross_table_lookup import (CrossTableLookup,
                                                  TableWithColumns)
    from zkm_tpu.stark.proof import MemRoots, PublicValues
    from zkm_tpu.stark.prover import prove_with_traces
    from zkm_tpu.tables import logic

    v = vectors["logic_proof"]
    assert v["config"] == "test_config"
    ops = [tuple(o) for o in v["ops"]]
    cols, filt = tuple(logic.ctl_data()), logic.ctl_filter()
    ctls = [CrossTableLookup((TableWithColumns(0, cols, filt),),
                             TableWithColumns(0, cols, filt))]
    pv = PublicValues(MemRoots.from_image_id(bytes([3] * 32)),
                      MemRoots.from_image_id(bytes([4] * 32)), bytes(32))
    config = StarkConfig.test_config()
    trace = logic.generate_trace(ops, min_rows=16)
    proof = prove_with_traces([logic.LogicStark()], config, [trace], ctls,
                              pv)

    cap = np.asarray(proof.stark_proofs[0].proof.trace_cap).astype(str)
    assert cap.tolist() == v["trace_cap"]
    assert str(proof.stark_proofs[0].proof.opening_proof.pow_witness) == \
        v["pow_witness"]
    flat = flatten_proof(proof)
    assert len(flat) == v["num_flat_elements"]
    digest = hashlib.sha256(
        b"".join(int(x).to_bytes(8, "little") for x in flat)).hexdigest()
    assert digest == v["sha256_flat"]
