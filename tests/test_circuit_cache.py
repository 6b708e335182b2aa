"""Shrink-circuit serialization + shape-keyed disk cache
(recursion/cache.py; reference analog fixed_recursive_verifier.rs:313-373
circuit serialization and recursion/src/lib.rs:32-45 per-shape indexing).
"""

import numpy as np
import pytest

from zkm_tpu.recursion import flatten_proof
from zkm_tpu.recursion.cache import (build_shrink_circuit_cached,
                                     load_circuit, proof_shape_key,
                                     save_circuit)
from zkm_tpu.recursion.shrink import (build_shrink_circuit, prove_shrink,
                                      verify_shrink)
from zkm_tpu.stark.config import StarkConfig
from zkm_tpu.stark.cross_table_lookup import (CrossTableLookup,
                                              TableWithColumns)
from zkm_tpu.stark.proof import MemRoots, PublicValues
from zkm_tpu.stark.prover import prove_with_traces
from zkm_tpu.tables import logic

OPS = [(logic.OP_AND, 0x12345678, 0x0F0F0F0F),
       (logic.OP_XOR, 0xDEADBEEF, 0xCAFEBABE)]


def _system():
    cols, filt = tuple(logic.ctl_data()), logic.ctl_filter()
    ctls = [CrossTableLookup((TableWithColumns(0, cols, filt),),
                             TableWithColumns(0, cols, filt))]
    return [logic.LogicStark()], ctls, StarkConfig.test_config()


@pytest.fixture(scope="module")
def inner():
    starks, ctls, config = _system()
    pv = PublicValues(MemRoots.from_image_id(bytes([3] * 32)),
                      MemRoots.from_image_id(bytes([4] * 32)), bytes(32))
    trace = logic.generate_trace(OPS, min_rows=16)
    return starks, ctls, config, prove_with_traces(
        starks, config, [trace], ctls, pv)


def test_circuit_roundtrip(inner, tmp_path):
    starks, ctls, config, proof = inner
    circuit = build_shrink_circuit(starks, ctls, config, proof)
    path = str(tmp_path / "c.pkl")
    save_circuit(circuit, path)
    loaded = load_circuit(path)

    assert (np.asarray(loaded.program_cap)
            == np.asarray(circuit.program_cap)).all()
    assert loaded.vdag.dag.n == circuit.vdag.dag.n
    assert len(loaded.vdag.dag.prog) == len(circuit.vdag.dag.prog)

    # the loaded circuit PROVES (witness gen replays the deserialized DAG)
    sp = prove_shrink(loaded, proof)
    verify_shrink(loaded, sp)
    # and produces the byte-identical proof the original circuit would
    sp2 = prove_shrink(circuit, proof)
    assert flatten_proof(sp) == flatten_proof(sp2)


def test_cached_build_hits_disk(inner, tmp_path):
    starks, ctls, config, proof = inner
    c1 = build_shrink_circuit_cached(starks, ctls, config, proof,
                                     cache_dir=str(tmp_path))
    files = list(tmp_path.glob("shrink_*.pkl"))
    assert len(files) == 1
    c2 = build_shrink_circuit_cached(starks, ctls, config, proof,
                                     cache_dir=str(tmp_path))
    assert c2.vdag.dag.n == c1.vdag.dag.n
    assert (np.asarray(c2.program_cap) == np.asarray(c1.program_cap)).all()
    sp = prove_shrink(c2, proof)
    verify_shrink(c1, sp)


def test_shape_key_sensitivity(inner):
    starks, ctls, config, proof = inner
    k1 = proof_shape_key(starks, ctls, config, proof)
    k2 = proof_shape_key(starks, ctls, StarkConfig.standard_fast_config(),
                         proof)
    assert k1 != k2
    k3 = proof_shape_key(starks, ctls, config, proof, tag="vkpins")
    assert k3 != k1
