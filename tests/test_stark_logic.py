"""End-to-end single-table STARK test on the Logic table.

Uses a self-CTL (the table looks up into itself) so the full aux-poly /
CTL-Z machinery is exercised; prove -> verify with transcript replay.
"""

import numpy as np
import pytest

from zkm_tpu.field import goldilocks as gl
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
    (logic.OP_NOR, 0x0, 0x1),
    (logic.OP_NOR, 0xFFFFFFFF, 0x0),
    (logic.OP_XOR, 1, 1),
    (logic.OP_AND, 0xFFFFFFFF, 0xFFFFFFFF),
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


def test_logic_prove_verify():
    trace = logic.generate_trace(OPS, min_rows=16)
    stark = logic.LogicStark()
    config = StarkConfig.test_config()
    ctls = [_self_ctl()]
    pv = _public_values()
    proof = prove_with_traces([stark], config, [trace], ctls, pv, debug=True)
    verify_proof([stark], proof, ctls, config)

    # tamper with an opening -> must fail
    bad = proof
    orig = bad.stark_proofs[0].proof.openings.local_values[0][0]
    bad.stark_proofs[0].proof.openings.local_values[0][0] = (int(orig) + 1) % gl.P
    with pytest.raises(Exception):
        verify_proof([stark], bad, ctls, config)
    bad.stark_proofs[0].proof.openings.local_values[0][0] = orig


def test_logic_standard_config():
    """Production parameters (rate 4, cap 16, arity-16 folds, 37 queries,
    16-bit PoW) on a 2^8-row trace."""
    ops = OPS * 20
    trace = logic.generate_trace(ops, min_rows=256)
    stark = logic.LogicStark()
    config = StarkConfig.standard_fast_config()
    ctls = [_self_ctl()]
    proof = prove_with_traces([stark], config, [trace], ctls,
                              _public_values())
    verify_proof([stark], proof, ctls, config)


def test_logic_bad_trace_fails_check():
    ops = list(OPS)
    trace = logic.generate_trace(ops, min_rows=16)
    # corrupt a result cell
    lo = trace[0].at[logic.RESULT, 0].set(trace[0][logic.RESULT, 0] + 1)
    bad_trace = (lo, trace[1])
    stark = logic.LogicStark()
    config = StarkConfig.test_config()
    ctls = [_self_ctl()]
    with pytest.raises(AssertionError):
        prove_with_traces([stark], config, [bad_trace], ctls,
                          _public_values(), debug=True)
