"""Adversarial shrink-proof forgeries (VERDICT r2 item 5).

Round 2's negative recursion tests only showed the HONEST prover refusing
(ReplayFailure at witness generation).  Here a malicious prover crafts
tampered shrink-system traces, runs the real prover over them (no debug
oracles), and `verify_shrink` must reject the resulting proof — the
soundness surface the reference covers via plonky2's circuit verifier
(recursive_verifier.rs:203-307).

Tamper matrix (mirrors tests/test_sha_integration.py's witness-level one,
but at the PROOF level):
  * VM op result        — an F_ADD row claims a wrong output
  * wire memory value   — a stored wire value changes between write & read
  * poseidon output     — a poseidon-call row lies about the permutation
  * program multiset    — an op row executes an instruction not in the
                          committed program (or skips one)
  * hint abuse          — a witnessed inverse is wrong (the guarding
                          F_ASSERT row's input becomes nonzero)
  * claim row           — the VM claim row diverges from PublicValues
"""

import numpy as np
import pytest

from zkm_tpu.field import goldilocks as gl
from zkm_tpu.recursion.shrink import (CLAIM_START, F_ADD, F_ASSERT, F_HINT,
                                      M_VAL, PC_OUT_V, V0, VOUT,
                                      build_shrink_circuit,
                                      generate_shrink_traces, prove_shrink,
                                      verify_shrink)
from zkm_tpu.recursion import flatten_proof
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

VM, WIREMEM, POSECALL, POSEIDON, PROGRAM_T = range(5)


def _self_ctl():
    cols = tuple(logic.ctl_data())
    filt = logic.ctl_filter()
    return CrossTableLookup(
        looking_tables=(TableWithColumns(0, cols, filt),),
        looked_table=TableWithColumns(0, cols, filt))


def _pv():
    return PublicValues(
        roots_before=MemRoots.from_image_id(bytes([7] * 32)),
        roots_after=MemRoots.from_image_id(bytes([8] * 32)),
        userdata=bytes(32))


@pytest.fixture(scope="module")
def setup():
    trace = logic.generate_trace(OPS, min_rows=16)
    stark = logic.LogicStark()
    config = StarkConfig.test_config()
    ctls = [_self_ctl()]
    inner = prove_with_traces([stark], config, [trace], ctls, _pv())
    verify_proof([stark], inner, ctls, config)
    circuit = build_shrink_circuit([stark], ctls, config, inner)
    honest = generate_shrink_traces(circuit.vdag.dag, circuit.prog,
                                    flatten_proof(inner))
    return circuit, inner, honest


def _reprove(circuit, inner, traces):
    """Run the REAL prover over (possibly forged) traces; returns AllProof."""
    return prove_with_traces(circuit.starks, circuit.config, traces,
                             circuit.ctls, inner.public_values)


def _mutate(traces, table, col, pick, delta=1):
    """Copy traces; add `delta` to column `col` of a row chosen by pick()
    from the (C, N) u64 view of `table`."""
    raw = [np.asarray(gl.to_u64(t)).copy() for t in traces]
    row = pick(raw[table])
    raw[table][col, row] = (int(raw[table][col, row]) + delta) % gl.P
    return [gl.from_u64(r) for r in raw], row


def _expect_reject(circuit, proof):
    with pytest.raises(Exception):
        verify_shrink(circuit, proof)


def test_honest_traces_prove_and_verify(setup):
    circuit, inner, honest = setup
    proof = _reprove(circuit, inner, honest)
    verify_shrink(circuit, proof)


def test_forged_vm_add_output(setup):
    circuit, inner, honest = setup

    def pick(vm):
        rows = np.nonzero(vm[F_ADD])[0]
        return int(rows[len(rows) // 2])

    forged, _ = _mutate(honest, VM, VOUT, pick)
    _expect_reject(circuit, _reprove(circuit, inner, forged))


def test_forged_wire_memory_value(setup):
    circuit, inner, honest = setup

    def pick(wm):
        # a real read row past the middle (value change between w & r)
        from zkm_tpu.recursion.shrink import M_IS_REAL, M_IS_WRITE
        rows = np.nonzero((wm[M_IS_REAL] == 1) & (wm[M_IS_WRITE] == 0))[0]
        return int(rows[len(rows) // 2])

    forged, _ = _mutate(honest, WIREMEM, M_VAL, pick)
    _expect_reject(circuit, _reprove(circuit, inner, forged))


def test_forged_poseidon_output(setup):
    circuit, inner, honest = setup

    def pick(pc):
        from zkm_tpu.recursion.shrink import PC_IS_REAL
        rows = np.nonzero(pc[PC_IS_REAL])[0]
        return int(rows[0])

    forged, _ = _mutate(honest, POSECALL, PC_OUT_V + 3, pick)
    _expect_reject(circuit, _reprove(circuit, inner, forged))


def test_forged_program_multiset(setup):
    """Executing an op the committed program doesn't contain: flip an ADD
    row into a SUB row (op flags swap) without touching the program table."""
    circuit, inner, honest = setup
    from zkm_tpu.recursion.shrink import F_SUB
    raw = [np.asarray(gl.to_u64(t)).copy() for t in honest]
    rows = np.nonzero(raw[VM][F_ADD])[0]
    r = int(rows[0])
    raw[VM][F_ADD, r] = 0
    raw[VM][F_SUB, r] = 1
    # keep the row arithmetically consistent so ONLY the multiset breaks
    v0 = int(raw[VM][V0, r])
    from zkm_tpu.recursion.shrink import V1
    v1 = int(raw[VM][V1, r])
    raw[VM][VOUT, r] = (v0 - v1) % gl.P
    forged = [gl.from_u64(x) for x in raw]
    _expect_reject(circuit, _reprove(circuit, inner, forged))


def test_forged_inverse_hint(setup):
    """Hint abuse: replace a witnessed inverse with garbage consistently in
    the VM row AND wire memory — the guarding F_ASSERT / downstream
    equations must still catch it in constraints, not replay."""
    circuit, inner, honest = setup
    raw = [np.asarray(gl.to_u64(t)).copy() for t in honest]
    hint_rows = np.nonzero(raw[VM][F_HINT])[0]
    assert len(hint_rows), "no hint ops recorded"
    r = int(hint_rows[0])
    old = int(raw[VM][VOUT, r])
    new = (old + 1) % gl.P
    raw[VM][VOUT, r] = new
    # propagate into wire memory (all slots holding the old value at the
    # hint's output address would desync otherwise; mutate just the write
    # row so the CTL stays balanced and read-consistency carries the lie)
    from zkm_tpu.recursion.shrink import M_IS_WRITE
    wrows = np.nonzero((raw[WIREMEM][M_VAL] == old)
                       & (raw[WIREMEM][M_IS_WRITE] == 1))[0]
    if len(wrows):
        raw[WIREMEM][M_VAL, int(wrows[0])] = new
    forged = [gl.from_u64(x) for x in raw]
    _expect_reject(circuit, _reprove(circuit, inner, forged))


def test_forged_claim_row(setup):
    circuit, inner, honest = setup
    forged, _ = _mutate(honest, VM, CLAIM_START, lambda vm: 0)
    _expect_reject(circuit, _reprove(circuit, inner, forged))
