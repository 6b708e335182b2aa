"""Recursion-level assumption composition (VERDICT r3 item 5).

The reference's `verify_block` accepts a composite receipt only after
verifying every proven assumption's own receipt
(fixed_recursive_verifier.rs:1069-1092, the assumption check calls
verify_root host-side).  Here the assumption receipt is a recursion-level
AggItem: discharge = verify_shrink under the verifying key that signed it
plus claim-digest equality with what SYS_VERIFY consumed; tampering with
either the assumption proof or its claim fails verification.
"""

import hashlib

import numpy as np
import pytest

from zkm_tpu.recursion.aggregate import (AggregationTree, AssumptionProof,
                                         CompositeBlockReceipt)
from zkm_tpu.recursion.shrink import build_shrink_circuit
from zkm_tpu.stark.config import StarkConfig
from zkm_tpu.stark.cross_table_lookup import (CrossTableLookup,
                                              TableWithColumns)
from zkm_tpu.stark.proof import MemRoots, PublicValues
from zkm_tpu.stark.prover import prove_with_traces
from zkm_tpu.stark.verifier import verify_proof
from zkm_tpu.tables import logic

OPS = [
    (logic.OP_AND, 0x12345678, 0x0F0F0F0F),
    (logic.OP_XOR, 0xDEADBEEF, 0xCAFEBABE),
]


def _rconfig():
    from zkm_tpu.fri.config import FriConfig
    return StarkConfig(
        security_bits=1, num_challenges=2,
        fri_config=FriConfig(rate_bits=2, cap_height=1,
                             proof_of_work_bits=1, num_query_rounds=2,
                             arity_bits=2, final_poly_bits=3))


def _self_ctl():
    cols = tuple(logic.ctl_data())
    filt = logic.ctl_filter()
    return CrossTableLookup(
        looking_tables=(TableWithColumns(0, cols, filt),),
        looked_table=TableWithColumns(0, cols, filt))


def _pv(tag_before: int, tag_after: int, userdata: bytes = bytes(32)):
    return PublicValues(
        roots_before=MemRoots.from_image_id(bytes([tag_before] * 32)),
        roots_after=MemRoots.from_image_id(bytes([tag_after] * 32)),
        userdata=userdata)


@pytest.fixture(scope="module")
def setup():
    """A 'program' proof and an 'assumption' proof (different claims),
    both shrunk through one tree."""
    stark = logic.LogicStark()
    config = _rconfig()
    ctls = [_self_ctl()]

    def prove(pv):
        trace = logic.generate_trace(OPS, min_rows=16)
        proof = prove_with_traces([stark], config, [trace], ctls, pv)
        verify_proof([stark], proof, ctls, config)
        return proof

    program = prove(_pv(0, 1))
    assumption = prove(_pv(7, 8, userdata=bytes([9] * 32)))

    circuit = build_shrink_circuit([stark], ctls, config, program)
    tree = AggregationTree(circuit, disk_cache=False)
    return tree, tree.shrink(program), tree.shrink(assumption)


def test_composite_block_receipt_verifies(setup):
    tree, program, assumption = setup
    ap = AssumptionProof(assumption)
    pv = assumption.proof.public_values
    expected = hashlib.sha256(pv.roots_before.to_image_id()
                              + pv.userdata).digest()
    assert ap.claim_digest() == expected

    receipt = tree.compose_block(program, [ap])
    tree.verify_block_receipt(receipt)


def test_tampered_assumption_claim_rejected(setup):
    tree, program, assumption = setup
    ap = AssumptionProof(assumption)
    receipt = tree.compose_block(program, [ap])
    # flip a byte of the recorded claim digest
    claim, proof = receipt.assumptions[0]
    receipt.assumptions[0] = (bytes([claim[0] ^ 1]) + claim[1:], proof)
    with pytest.raises(ValueError, match="claim digest"):
        tree.verify_block_receipt(receipt)


def test_tampered_assumption_proof_rejected(setup):
    tree, program, assumption = setup
    from copy import deepcopy
    bad = deepcopy(assumption)
    # forge the assumption's claimed public values (claim digest recomputes
    # consistently, so only the proof itself can betray the forgery)
    bad.proof.public_values.userdata = bytes([1] * 32)
    receipt = tree.compose_block(program, [AssumptionProof(bad)])
    with pytest.raises(Exception):
        tree.verify_block_receipt(receipt)


def test_foreign_verifying_key_rejected(setup):
    tree, program, assumption = setup
    from copy import deepcopy
    foreign = deepcopy(assumption)
    foreign.program_cap = np.asarray(foreign.program_cap).copy()
    foreign.program_cap.flat[0] ^= 1
    receipt = tree.compose_block(program, [AssumptionProof(foreign)])
    with pytest.raises(KeyError, match="foreign program cap"):
        tree.verify_block_receipt(receipt)


def test_assumption_proof_resolves_in_witness_env(setup):
    """AssumptionProof duck-types into the SYS_VERIFY resolution
    environment (receipts.find_assumption)."""
    from zkm_tpu.receipts import find_assumption
    tree, program, assumption = setup
    ap = AssumptionProof(assumption)
    assert find_assumption(ap.claim_digest(), [ap]) is ap
    with pytest.raises(KeyError):
        find_assumption(bytes(32), [ap])
