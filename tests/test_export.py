"""Proof export/import round-trip (stage R4 wrap interface, zkm_tpu/export.py;
reference analog recursion/src/lib.rs:140-155 JSON artifacts)."""

import json

import pytest

from zkm_tpu.export import (export_proof_json, import_proof,
                            import_proof_json)
from zkm_tpu.stark.config import StarkConfig
from zkm_tpu.stark.cross_table_lookup import (CrossTableLookup,
                                              TableWithColumns)
from zkm_tpu.stark.proof import MemRoots, PublicValues
from zkm_tpu.stark.prover import prove_with_traces
from zkm_tpu.stark.verifier import verify_proof
from zkm_tpu.tables import logic


@pytest.fixture(scope="module")
def proof_env():
    trace = logic.generate_trace(
        [(logic.OP_AND, 0x12345678, 0x0F0F0F0F)], min_rows=16)
    stark = logic.LogicStark()
    config = StarkConfig.test_config()
    cols = tuple(logic.ctl_data())
    filt = logic.ctl_filter()
    ctls = [CrossTableLookup((TableWithColumns(0, cols, filt),),
                             TableWithColumns(0, cols, filt))]
    pv = PublicValues(roots_before=MemRoots.from_image_id(bytes(32)),
                      roots_after=MemRoots.from_image_id(bytes([1] * 32)),
                      userdata=bytes(32))
    proof = prove_with_traces([stark], config, [trace], ctls, pv)
    return [stark], ctls, config, proof


def test_export_roundtrip_verifies(proof_env):
    starks, ctls, config, proof = proof_env
    s = export_proof_json(proof, config)
    back = import_proof_json(s)
    verify_proof(starks, back, ctls, config)
    assert back.public_values.roots_after.root == \
        proof.public_values.roots_after.root


def test_export_is_plain_json_strings(proof_env):
    """Field elements are decimal strings (no > 2^53 JSON numbers)."""
    _, _, config, proof = proof_env
    doc = json.loads(export_proof_json(proof, config))
    assert doc["version"] == 1
    cap0 = doc["stark_proofs"][0]["trace_cap"][0][0]
    assert isinstance(cap0, str)

    def no_big_numbers(v):
        if isinstance(v, dict):
            for x in v.values():
                no_big_numbers(x)
        elif isinstance(v, list):
            for x in v:
                no_big_numbers(x)
        elif isinstance(v, (int, float)):
            assert abs(v) < 2 ** 53
    no_big_numbers(doc)


def test_import_rejects_tampering(proof_env):
    starks, ctls, config, proof = proof_env
    doc = json.loads(export_proof_json(proof, config))
    v = int(doc["stark_proofs"][0]["openings"]["local_values"][0][0])
    doc["stark_proofs"][0]["openings"]["local_values"][0][0] = str(v + 1)
    with pytest.raises(Exception):
        verify_proof(starks, import_proof(doc), ctls, config)
