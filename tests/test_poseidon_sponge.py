"""PoseidonSponge table: trace semantics + low-degree + CTL digest parity.

Reference tests: poseidon_sponge_stark.rs test_generation / test_stark_degree.
"""

import numpy as np
import pytest

from zkm_tpu.hash import poseidon as ps
from zkm_tpu.stark.stark_testing import check_stark_low_degree
from zkm_tpu.tables import poseidon_sponge as sp
from zkm_tpu.witness.generation import PoseidonSpongeOp


def _op(data: bytes, virt0: int = 0x100, ts: int = 10):
    addrs = [(0, 0, virt0 + 4 * i) for i in range(len(data) // 4)]
    return PoseidonSpongeOp(base_address=addrs, timestamp=ts, input=data)


def test_low_degree():
    check_stark_low_degree(sp.PoseidonSpongeStark())


def test_trace_digest_matches_sponge():
    data = bytes(range(40))          # 1 full block + final block of 8
    rows = sp.generate_rows([_op(data)])
    cols = rows  # (C, N)
    # two active rows
    assert cols[sp.IS_FULL_INPUT_BLOCK, 0] == 1
    assert cols[sp.IS_FULL_INPUT_BLOCK, 1] == 0
    assert cols[sp.IS_FINAL_INPUT_LEN.start + 8, 1] == 1
    digest = [int(cols[c, 1]) for c in sp.UPDATED_DIGEST]
    expected = [int(x) for x in ps.poseidon_bytes(data)]
    assert digest == expected
    # chaining: row1 original state == row0 updated state
    after = [int(cols[c, 0]) for c in sp.UPDATED_DIGEST] + \
            [int(cols[c, 0]) for c in sp.PARTIAL_UPDATED]
    before = [int(cols[c, 1]) for c in sp.ORIGINAL_RATE] + \
             [int(cols[c, 1]) for c in sp.ORIGINAL_CAPACITY]
    assert after == before
    # new_rate == LE recombination of block bytes
    for w in range(sp.SPONGE_RATE):
        b = [int(cols[sp.BLOCK_BYTES.start + 4 * w + j, 0])
             for j in range(4)]
        comb = sum(x << (8 * i) for i, x in enumerate(b))
        assert comb == int(cols[sp.NEW_RATE.start + w, 0])


def test_trace_page_sized_op():
    data = bytes(4096)
    rows = sp.generate_rows([_op(data)])
    nactive = 4096 // 32 + 1
    flags = rows[sp.IS_FULL_INPUT_BLOCK, :nactive]
    assert flags[:-1].all() and flags[-1] == 0
    assert rows[sp.IS_FINAL_INPUT_LEN.start, nactive - 1] == 1  # flen = 0
    digest = [int(rows[c, nactive - 1]) for c in sp.UPDATED_DIGEST]
    expected = [int(x) for x in ps.poseidon_bytes(data)]
    assert digest == expected


def test_constraints_hold_on_real_trace():
    """Feed a real trace through the constraint system (every alpha row
    must be zero) — uses the prover's own whole-trace checker."""
    from zkm_tpu.field import goldilocks as gl
    from zkm_tpu.stark.prover import check_constraints

    data1 = bytes(range(64))      # 2 full + pad-only final
    data2 = (b"\xaa" * 36)        # 1 full + 4-byte final
    trace = sp.generate_trace([_op(data1), _op(data2, virt0=0x900, ts=20)])
    n = trace[0].shape[-1]
    check_constraints(sp.PoseidonSpongeStark(), trace, None,
                      [3, 5], 0, (), [], n.bit_length() - 1)
