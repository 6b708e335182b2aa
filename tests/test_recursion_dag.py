"""Stage-R1 recursion tests: the recorded verifier DAG must accept exactly
the proofs the native verifier accepts (docs/recursion.md: "replay the DAG
on a real proof and compare with the native verifier" — the analog of the
reference's test_stark_circuit_constraints, recursive_verifier.rs:203-307).
"""

import numpy as np
import pytest

from zkm_tpu.field import goldilocks as gl
from zkm_tpu.recursion import (ReplayFailure, evaluate, flatten_proof,
                               record_verifier)
from zkm_tpu.stark.config import StarkConfig
from zkm_tpu.stark.cross_table_lookup import (CrossTableLookup,
                                              TableWithColumns)
from zkm_tpu.stark.prover import prove_with_traces
from zkm_tpu.stark.proof import MemRoots, PublicValues
from zkm_tpu.stark.verifier import verify_proof
from zkm_tpu.tables import logic


OPS = [
    (logic.OP_AND, 0x12345678, 0x0F0F0F0F),
    (logic.OP_OR, 0xFFFF0000, 0x00FF00FF),
    (logic.OP_XOR, 0xDEADBEEF, 0xCAFEBABE),
    (logic.OP_NOR, 0xFFFFFFFF, 0x0),
]


def _self_ctl():
    cols = tuple(logic.ctl_data())
    filt = logic.ctl_filter()
    return CrossTableLookup(
        looking_tables=(TableWithColumns(0, cols, filt),),
        looked_table=TableWithColumns(0, cols, filt))


def _public_values():
    return PublicValues(
        roots_before=MemRoots.from_image_id(bytes(range(32))),
        roots_after=MemRoots.from_image_id(bytes(range(32, 64))),
        userdata=bytes(32))


@pytest.fixture(scope="module")
def logic_proof():
    trace = logic.generate_trace(OPS, min_rows=16)
    stark = logic.LogicStark()
    config = StarkConfig.test_config()
    ctls = [_self_ctl()]
    proof = prove_with_traces([stark], config, [trace], ctls,
                              _public_values())
    verify_proof([stark], proof, ctls, config)
    return stark, config, ctls, proof


@pytest.fixture(scope="module")
def logic_dag(logic_proof):
    stark, config, ctls, proof = logic_proof
    vd = record_verifier([stark], ctls, config, proof)
    return vd


def test_dag_accepts_valid_proof(logic_proof, logic_dag):
    _, _, _, proof = logic_proof
    pubs = flatten_proof(proof)
    assert len(pubs) == logic_dag.num_public_inputs
    evaluate(logic_dag.dag, pubs)          # raises ReplayFailure on reject
    stats = logic_dag.dag.stats()
    assert stats["poseidons"] > 0
    assert stats["asserts"] > 0


def test_dag_rejects_tampered_opening(logic_proof, logic_dag):
    _, _, _, proof = logic_proof
    op = proof.stark_proofs[0].proof.openings
    orig = int(op.local_values[0][0])
    op.local_values[0][0] = (orig + 1) % gl.P
    try:
        pubs = flatten_proof(proof)
    finally:
        op.local_values[0][0] = orig
    with pytest.raises(ReplayFailure):
        evaluate(logic_dag.dag, pubs)


def test_dag_rejects_tampered_cap(logic_proof, logic_dag):
    _, _, _, proof = logic_proof
    cap = proof.stark_proofs[0].proof.trace_cap
    orig = int(cap[0][0])
    cap[0][0] = (orig + 1) % gl.P
    try:
        pubs = flatten_proof(proof)
    finally:
        cap[0][0] = orig
    with pytest.raises(ReplayFailure):
        evaluate(logic_dag.dag, pubs)


def test_dag_rejects_tampered_public_values(logic_proof, logic_dag):
    """Changing a public root changes the transcript -> challenger-state
    assertions fail."""
    _, _, _, proof = logic_proof
    pubs = flatten_proof(proof)
    # roots_before occupy the first 8 slots of the flattened layout
    bad = list(pubs)
    bad[0] = (bad[0] + 1) % gl.P
    with pytest.raises(ReplayFailure):
        evaluate(logic_dag.dag, bad)


def test_dag_rejects_tampered_ctl_z(logic_proof, logic_dag):
    _, _, _, proof = logic_proof
    op = proof.stark_proofs[0].proof.openings
    orig = int(op.ctl_zs_first[0])
    op.ctl_zs_first[0] = (orig + 1) % gl.P
    try:
        pubs = flatten_proof(proof)
    finally:
        op.ctl_zs_first[0] = orig
    with pytest.raises(ReplayFailure):
        evaluate(logic_dag.dag, pubs)


def test_dag_shape_reuse(logic_proof, logic_dag):
    """A second proof of the same shape replays through the SAME dag."""
    stark, config, ctls, _ = logic_proof
    ops2 = [(logic.OP_XOR, 7, 9), (logic.OP_AND, 3, 5),
            (logic.OP_OR, 0, 0xFFFF), (logic.OP_NOR, 1, 2)]
    trace = logic.generate_trace(ops2, min_rows=16)
    pv = PublicValues(
        roots_before=MemRoots.from_image_id(bytes([7] * 32)),
        roots_after=MemRoots.from_image_id(bytes([9] * 32)),
        userdata=bytes(32))
    proof2 = prove_with_traces([stark], config, [trace], ctls, pv)
    verify_proof([stark], proof2, ctls, config)
    evaluate(logic_dag.dag, flatten_proof(proof2))
