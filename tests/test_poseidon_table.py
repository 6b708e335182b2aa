"""Poseidon table: trace generation matches the permutation kernel, and the
table proves + verifies end-to-end."""

import numpy as np
import pytest

from zkm_tpu.field import goldilocks as gl
from zkm_tpu.hash import poseidon as ps
from zkm_tpu.stark.config import StarkConfig
from zkm_tpu.stark.cross_table_lookup import (CrossTableLookup,
                                              TableWithColumns)
from zkm_tpu.stark.prover import prove_with_traces
from zkm_tpu.stark.proof import MemRoots, PublicValues
from zkm_tpu.stark.verifier import verify_proof
from zkm_tpu.tables import poseidon as pt


def _perms(rng, k=5):
    out = []
    for t in range(k):
        inputs = [int(x) for x in
                  rng.integers(0, gl.P, size=12, dtype=np.uint64)]
        out.append((inputs, 10 * (t + 1)))
    out.append(([0] * 12, 0))
    return out


def test_trace_outputs_match_permutation(rng):
    perms = _perms(rng)
    trace = pt.generate_trace(perms, min_rows=8)
    rows = gl.to_u64(trace).T
    for r, (inputs, ts) in enumerate(perms):
        want = ps.permute_host(inputs)
        got = [int(rows[r, pt.reg_out(i)]) for i in range(12)]
        assert got == want, r
        assert int(rows[r, pt.TIMESTAMP]) == ts


def test_poseidon_table_prove_verify(rng):
    perms = _perms(rng, k=3)
    trace = pt.generate_trace(perms, min_rows=8)
    stark = pt.PoseidonStark()
    config = StarkConfig.test_config()
    cols = tuple(pt.ctl_data_inputs())
    filt = pt.ctl_filter()
    ctls = [CrossTableLookup((TableWithColumns(0, cols, filt),),
                             TableWithColumns(0, cols, filt))]
    pv = PublicValues(MemRoots.from_image_id(bytes(32)),
                      MemRoots.from_image_id(bytes(32)), bytes(32))
    # debug=False: the check_constraints oracle would compile a second
    # poseidon-sized graph; the smaller tables exercise that path.
    proof = prove_with_traces([stark], config, [trace], ctls, pv)
    verify_proof([stark], proof, ctls, config)


def test_poseidon_table_bad_witness_fails(rng):
    perms = _perms(rng, k=3)
    trace = pt.generate_trace(perms, min_rows=8)
    lo = trace[0].at[pt.reg_out(0), 0].set(trace[0][pt.reg_out(0), 0] ^ 1)
    bad = (lo, trace[1])
    stark = pt.PoseidonStark()
    config = StarkConfig.test_config()
    cols = tuple(pt.ctl_data_inputs())
    filt = pt.ctl_filter()
    ctls = [CrossTableLookup((TableWithColumns(0, cols, filt),),
                             TableWithColumns(0, cols, filt))]
    pv = PublicValues(MemRoots.from_image_id(bytes(32)),
                      MemRoots.from_image_id(bytes(32)), bytes(32))
    # without the debug oracle the bad witness surfaces at verification
    proof = prove_with_traces([stark], config, [bad], ctls, pv)
    with pytest.raises(Exception):
        verify_proof([stark], proof, ctls, config)
