"""KeccakSponge table: trace semantics + low degree.

Reference tests: keccak_sponge_stark.rs test_generation / test_stark_degree.
"""

import numpy as np

from zkm_tpu.hash.keccak import keccak256
from zkm_tpu.stark.stark_testing import check_stark_low_degree
from zkm_tpu.stark.constraint_debug import check_stark_constraints
from zkm_tpu.tables import keccak_sponge as ks
from zkm_tpu.witness.generation import KeccakSpongeOp


def _op(data: bytes, virt0: int = 0x100, ts: int = 10):
    addrs = [(0, 0, virt0 + 4 * i) for i in range(len(data) // 4)]
    return KeccakSpongeOp(base_address=addrs, timestamp=ts, input=data)


def test_low_degree():
    check_stark_low_degree(ks.KeccakSpongeStark())


def test_trace_digest_matches_keccak256():
    data = bytes(range(200))         # 1 full block + final block of 64
    rows = ks.generate_rows([_op(data)])
    assert rows[ks.IS_FULL_INPUT_BLOCK, 0] == 1
    assert rows[ks.IS_FINAL_INPUT_LEN.start + 64, 1] == 1
    digest = bytes(int(rows[c, 1]) for c in ks.UPDATED_DIGEST_BYTES)
    assert digest == keccak256(data)
    # chaining: row1 original state == row0 updated state
    after = [int(sum(rows[ks.UPDATED_DIGEST_BYTES.start + 4 * l + i, 0]
                     << (8 * i) for i in range(4)))
             for l in range(ks.DIGEST_U32S)] + \
            [int(rows[c, 0]) for c in ks.PARTIAL_UPDATED]
    before = [int(rows[c, 1]) for c in ks.ORIGINAL_RATE] + \
             [int(rows[c, 1]) for c in ks.ORIGINAL_CAPACITY]
    assert after == before


def test_constraints_hold_on_real_trace():
    ops = [_op(bytes(range(136))), _op(b"\x5a" * 272, virt0=0x900, ts=20)]
    check_stark_constraints(ks.KeccakSpongeStark(), ks.generate_rows(ops))


def test_constraints_hold_on_empty_trace():
    check_stark_constraints(ks.KeccakSpongeStark(), ks.generate_rows([]))
