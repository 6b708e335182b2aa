"""Recursion on REAL segment proofs (VERDICT r3 item 3).

Shrinks an actual multi-table segment proof (the fib guest's first
segment, 3-table Cpu/Logic/Memory subset — the same workload as the
driver's dryrun) through build_shrink_circuit/prove_shrink, then
aggregates TWO real chained segments through the AggregationTree — the
reference's actual per-segment workload (`prove_root` ->
`prove_aggregation`, fixed_recursive_verifier.rs:769-980).

Slow-marked: the inner proofs + the shrink proof take tens of minutes on
the 4-core CI host (measured numbers live in BASELINE.md §recursion).
Run with ZKM_SLOW=1.
"""

import numpy as np
import pytest

from zkm_tpu.emulator.state import State
from zkm_tpu.emulator.utils import split_prog_into_segs
from zkm_tpu.host import prove_segment, verify_segment_receipt
from zkm_tpu.stark.all_stark import Table, make_all_stark
from zkm_tpu.stark.config import StarkConfig

pytestmark = pytest.mark.slow

SUBSET = (Table.Cpu, Table.Logic, Table.Memory)


@pytest.fixture(scope="module")
def segment_proofs():
    from zkm_tpu.runtime.examples import build_fib_guest
    prog = build_fib_guest(40)
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1800)
    assert len(segs) >= 2
    config = StarkConfig.test_config()
    all_stark = make_all_stark(SUBSET)
    receipts = [prove_segment(s, config, all_stark) for s in segs[:2]]
    for r in receipts:
        verify_segment_receipt(r, config, all_stark)
    return all_stark, config, receipts


def test_shrink_real_segment_proof(segment_proofs):
    from zkm_tpu.recursion.shrink import (build_shrink_circuit,
                                          prove_shrink, verify_shrink)
    all_stark, config, receipts = segment_proofs
    inner = receipts[0].proof

    circuit = build_shrink_circuit(
        all_stark.starks, all_stark.ctls, config, inner)
    print(f"[recursion] verifier DAG wires={circuit.vdag.dag.n} "
          f"poseidons={circuit.vdag.dag.num_poseidons} "
          f"ops={len(circuit.vdag.dag.prog)}")

    shrunk = prove_shrink(circuit, inner)
    verify_shrink(circuit, shrunk)
    print(f"[recursion] shrink table heights: "
          f"{[pm.degree_bits for pm in shrunk.stark_proofs]}")

    # the shrink claims exactly the segment's public values
    assert shrunk.public_values.roots_before.root == \
        inner.public_values.roots_before.root
    assert shrunk.public_values.roots_after.root == \
        inner.public_values.roots_after.root
    assert shrunk.public_values.userdata == inner.public_values.userdata


def test_aggregate_two_real_segments(segment_proofs):
    from zkm_tpu.recursion.aggregate import AggregationTree
    from zkm_tpu.recursion.shrink import build_shrink_circuit, verify_shrink
    all_stark, config, receipts = segment_proofs

    circuit = build_shrink_circuit(
        all_stark.starks, all_stark.ctls, config, receipts[0].proof)
    tree = AggregationTree(circuit)
    items = [tree.shrink(r.proof) for r in receipts]
    root = tree.aggregate(items)
    verify_shrink(tree.circuit_for(root), root.proof)

    # combined claim: first segment's pre-state -> last segment's post-state
    assert root.proof.public_values.roots_before.root == \
        receipts[0].proof.public_values.roots_before.root
    assert root.proof.public_values.roots_after.root == \
        receipts[1].proof.public_values.roots_after.root


def test_wrap_aggregated_root_groth16(segment_proofs):
    """VERDICT r3 item 4 done-condition: segment -> shrink -> aggregate ->
    export -> Groth16 wrap -> verify, plus verifier.sol emission.  The
    aggregation root from the previous test's pipeline is rebuilt here
    (module-scope circuit reuse keeps it one recording)."""
    import json

    from zkm_tpu import export
    from zkm_tpu.recursion.aggregate import AggregationTree
    from zkm_tpu.recursion.shrink import build_shrink_circuit
    from zkm_tpu.snark import groth16 as g16
    from zkm_tpu.snark import mimc, wrap
    from zkm_tpu.snark.contract import emit_verifier_sol

    all_stark, config, receipts = segment_proofs
    circuit = build_shrink_circuit(
        all_stark.starks, all_stark.ctls, config, receipts[0].proof)
    tree = AggregationTree(circuit)
    root = tree.aggregate([tree.shrink(r.proof) for r in receipts])

    doc = export.export_proof(root.proof, circuit.config,
                              program_cap=root.program_cap)
    pk = wrap.groth16_setup()
    wp = wrap.wrap_stark_bn254(doc, pk)
    assert g16.verify(pk.vk, wp.public_inputs, wp.proof)
    # digest binds the exported claim (incl. the aggregated proof bytes)
    assert wp.public_inputs[0] == mimc.hash_elements(wrap.claim_limbs(doc))
    # tampering the claim fails verification
    bad = list(wp.public_inputs)
    bad[1] ^= 1
    assert not g16.verify(pk.vk, bad, wp.proof)

    sol = emit_verifier_sol(pk.vk)
    assert "function verifyProof" in sol
    parsed = json.loads(wp.to_json())
    assert len(parsed["public_inputs"]) == 11
