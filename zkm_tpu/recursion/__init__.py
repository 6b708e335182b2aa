"""Recursion / aggregation layer (docs/recursion.md).

Stage R1 (this package): the multi-table STARK verifier recorded as a flat
arithmetic DAG over Goldilocks wires — the TPU-native analog of
/root/reference/prover/src/recursive_verifier.rs `recursive_stark_circuit`.
Stage R2 lowers the DAG to the uniform Verifier table proven by the same
STARK engine.
"""

from .dag import Dag, Wire, ReplayFailure, evaluate
from .verifier_dag import (VerifierDag, flatten_proof, record_chain,
                           record_verifier)
from .shrink import (ShrinkCircuit, build_aggregation_circuit,
                     build_shrink_circuit, prove_aggregation, prove_shrink,
                     verify_shrink)
from .aggregate import AggItem, AggregationTree

__all__ = [
    "Dag", "Wire", "ReplayFailure", "evaluate",
    "VerifierDag", "flatten_proof", "record_verifier", "record_chain",
    "ShrinkCircuit", "build_shrink_circuit", "prove_shrink", "verify_shrink",
    "build_aggregation_circuit", "prove_aggregation",
    "AggItem", "AggregationTree",
]
