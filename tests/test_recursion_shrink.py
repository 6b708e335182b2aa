"""Stage-R2 shrink tests: a real inner proof shrinks into the fixed 5-table
verifier STARK and verifies; the verifying key (program cap) and the claim
binding reject tampering (docs/recursion.md stage R2; reference analog
recursive_verifier.rs:203-307 + fixed_recursive_verifier.rs:377-611).
"""

import numpy as np
import pytest

from zkm_tpu.field import goldilocks as gl
from zkm_tpu.recursion import flatten_proof
from zkm_tpu.recursion.shrink import (PROGRAM, build_shrink_circuit,
                                      generate_shrink_traces, prove_shrink,
                                      verify_shrink)
from zkm_tpu.stark.config import StarkConfig
from zkm_tpu.stark.cross_table_lookup import (CrossTableLookup,
                                              TableWithColumns)
from zkm_tpu.stark.prover import prove_with_traces
from zkm_tpu.stark.proof import MemRoots, PublicValues
from zkm_tpu.stark.verifier import verify_proof
from zkm_tpu.tables import logic


OPS = [
    (logic.OP_AND, 0x12345678, 0x0F0F0F0F),
    (logic.OP_XOR, 0xDEADBEEF, 0xCAFEBABE),
    (logic.OP_NOR, 0xFFFFFFFF, 0x0),
]


def _self_ctl():
    cols = tuple(logic.ctl_data())
    filt = logic.ctl_filter()
    return CrossTableLookup(
        looking_tables=(TableWithColumns(0, cols, filt),),
        looked_table=TableWithColumns(0, cols, filt))


def _pv(tag: int = 0):
    return PublicValues(
        roots_before=MemRoots.from_image_id(bytes([tag] * 32)),
        roots_after=MemRoots.from_image_id(bytes([tag + 1] * 32)),
        userdata=bytes(32))


@pytest.fixture(scope="module")
def inner():
    trace = logic.generate_trace(OPS, min_rows=16)
    stark = logic.LogicStark()
    config = StarkConfig.test_config()
    ctls = [_self_ctl()]
    proof = prove_with_traces([stark], config, [trace], ctls, _pv())
    verify_proof([stark], proof, ctls, config)
    return [stark], ctls, config, proof


@pytest.fixture(scope="module")
def circuit(inner):
    starks, ctls, config, proof = inner
    return build_shrink_circuit(starks, ctls, config, proof)


@pytest.fixture(scope="module")
def shrunk(circuit, inner):
    _, _, _, proof = inner
    sp = prove_shrink(circuit, proof, debug=True)
    return sp


def test_shrink_proves_and_verifies(circuit, shrunk, inner):
    verify_shrink(circuit, shrunk)
    # the shrink proof carries the inner claim unchanged
    _, _, _, proof = inner
    assert shrunk.public_values.roots_before.root == \
        proof.public_values.roots_before.root
    assert shrunk.public_values.roots_after.root == \
        proof.public_values.roots_after.root


def test_shrink_rejects_wrong_vk(circuit, shrunk):
    import copy
    bad_circuit = copy.copy(circuit)
    bad_circuit.program_cap = circuit.program_cap.copy()
    bad_circuit.program_cap[0][0] ^= 1
    with pytest.raises(ValueError, match="verifying key"):
        verify_shrink(bad_circuit, shrunk)


def test_shrink_rejects_tampered_claim(circuit, shrunk):
    """Changing the public claim must fail: the claim is bound by the
    first-row boundary constraints (quotient identity breaks)."""
    pv = shrunk.public_values
    orig = pv.roots_before.root[0]
    pv.roots_before.root[0] = (int(orig) + 1) % gl.P
    try:
        with pytest.raises(Exception):
            verify_shrink(circuit, shrunk)
    finally:
        pv.roots_before.root[0] = orig
    verify_shrink(circuit, shrunk)   # restored -> verifies again


def test_shrink_rejects_tampered_opening(circuit, shrunk):
    op = shrunk.stark_proofs[0].proof.openings
    orig = int(op.local_values[0][0])
    op.local_values[0][0] = (orig + 1) % gl.P
    try:
        with pytest.raises(Exception):
            verify_shrink(circuit, shrunk)
    finally:
        op.local_values[0][0] = orig


def test_shrink_witness_rejects_invalid_inner(circuit, inner):
    """Shrinking a tampered inner proof fails at witness generation (the
    DAG replay hits a failed assertion)."""
    from zkm_tpu.recursion import ReplayFailure
    _, _, _, proof = inner
    op = proof.stark_proofs[0].proof.openings
    orig = int(op.local_values[0][0])
    op.local_values[0][0] = (orig + 1) % gl.P
    try:
        with pytest.raises(ReplayFailure):
            generate_shrink_traces(circuit.vdag.dag, circuit.prog,
                                   flatten_proof(proof))
    finally:
        op.local_values[0][0] = orig
