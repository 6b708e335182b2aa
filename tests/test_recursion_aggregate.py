"""Stage-R3 aggregation tests: two shrunk segment proofs aggregate into one
fixed-shape proof claiming the combined continuation (reference analog
fixed_recursive_verifier.rs:613-695,920-980); continuation violations and
wrong child verifying keys are rejected at witness replay.

The full prove path of an aggregation node (one DAG verifying TWO 5-table
shrink proofs) is exercised once; the rejection tests reuse the recorded
circuit and fail fast in DAG replay, before any proving.
"""

import numpy as np
import pytest

from zkm_tpu.recursion import ReplayFailure
from zkm_tpu.recursion.aggregate import AggItem, AggregationTree
from zkm_tpu.recursion.shrink import (build_shrink_circuit, prove_shrink,
                                      verify_shrink)
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
    (logic.OP_NOR, 0xFFFFFFFF, 0x0),
]


def _rconfig():
    """Even smaller than test_config: the aggregation DAG verifies TWO
    5-table proofs, and its size is linear in num_query_rounds."""
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


def _pv(tag_before: int, tag_after: int):
    return PublicValues(
        roots_before=MemRoots.from_image_id(bytes([tag_before] * 32)),
        roots_after=MemRoots.from_image_id(bytes([tag_after] * 32)),
        userdata=bytes(32))


@pytest.fixture(scope="module")
def segments():
    """Two chained inner segment proofs: roots 0->1 and 1->2."""
    stark = logic.LogicStark()
    config = _rconfig()
    ctls = [_self_ctl()]
    proofs = []
    for tag in (0, 1):
        trace = logic.generate_trace(OPS, min_rows=16)
        proof = prove_with_traces([stark], config, [trace], ctls,
                                  _pv(tag, tag + 1))
        verify_proof([stark], proof, ctls, config)
        proofs.append(proof)
    return [stark], ctls, config, proofs


@pytest.fixture(scope="module")
def tree(segments):
    starks, ctls, config, proofs = segments
    shrink_circuit = build_shrink_circuit(starks, ctls, config, proofs[0])
    return AggregationTree(shrink_circuit)


@pytest.fixture(scope="module")
def leaves(tree, segments):
    _, _, _, proofs = segments
    return [tree.shrink(p) for p in proofs]


@pytest.fixture(scope="module")
def root(tree, leaves):
    return tree.aggregate(leaves)


def test_aggregate_claims_combined_continuation(root, segments):
    _, _, _, proofs = segments
    pv = root.proof.public_values
    assert pv.roots_before.root == proofs[0].public_values.roots_before.root
    assert pv.roots_after.root == proofs[1].public_values.roots_after.root


def test_aggregate_verifies_and_pins_vk(tree, root, leaves):
    circuit = tree.node_circuit(leaves[0], leaves[1])
    verify_shrink(circuit, root.proof)
    assert (root.program_cap == circuit.program_cap).all()
    # the aggregation node has its own verifying key, distinct from the leaf
    assert not (root.program_cap == tree.shrink_circuit.program_cap).all()


def test_aggregate_rejects_broken_continuation(tree, leaves, segments):
    """Children whose claims do not chain fail at DAG replay."""
    starks, ctls, config, _ = segments
    trace = logic.generate_trace(OPS, min_rows=16)
    orphan = prove_with_traces(starks, config, [trace], ctls, _pv(7, 8))
    orphan_item = tree.shrink(orphan)
    from zkm_tpu.recursion.shrink import prove_aggregation
    circuit = tree.node_circuit(leaves[0], orphan_item)
    with pytest.raises(ReplayFailure, match="roots_after != roots_before"):
        prove_aggregation(circuit, [leaves[0].proof, orphan_item.proof])


def test_aggregate_rejects_wrong_child_vk(tree, leaves):
    """A child proof whose program table differs from the pinned verifying
    key fails the in-DAG cap pin at witness replay."""
    from zkm_tpu.recursion.shrink import PROGRAM, prove_aggregation
    circuit = tree.node_circuit(leaves[0], leaves[1])
    cap = leaves[1].proof.stark_proofs[PROGRAM].proof.trace_cap
    orig = int(cap[0][0])
    cap[0][0] = orig ^ 1
    try:
        with pytest.raises(ReplayFailure, match="vk cap"):
            prove_aggregation(circuit, [leaves[0].proof, leaves[1].proof])
    finally:
        cap[0][0] = orig


def test_prove_block_chains_parent(tree, root, leaves):
    """Block chaining reuses the aggregation node: genesis passes through,
    a parented block is one more aggregation step."""
    assert tree.prove_block(None, root) is root
