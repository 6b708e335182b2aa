"""Keccak-f table: trace semantics vs the host permutation, constraints on
real traces, low degree, and tamper detection.

Reference tests: keccak_stark.rs test_generation / test_stark_degree.
"""

import numpy as np
import pytest

from zkm_tpu.hash.keccak import keccak_f
from zkm_tpu.stark.constraint_debug import check_stark_constraints
from zkm_tpu.stark.stark_testing import check_stark_low_degree
from zkm_tpu.tables import keccak as kk


def _inputs(n=3, seed=7):
    rng = np.random.default_rng(seed)
    return [([int(x) for x in rng.integers(0, 1 << 64, 25,
                                           dtype=np.uint64)], 10 * (i + 1))
            for i in range(n)]


def test_trace_output_matches_keccak_f():
    inputs = _inputs()
    rows = kk.generate_rows(inputs)
    for p, (state, ts) in enumerate(inputs):
        expected = keccak_f(state)
        last = p * kk.NUM_ROUNDS + kk.NUM_ROUNDS - 1
        for i in range(25):
            x, y = i % 5, i // 5
            lo = int(rows[kk.reg_a_prime_prime_prime(x, y), last])
            hi = int(rows[kk.reg_a_prime_prime_prime(x, y) + 1, last])
            assert lo | (hi << 32) == expected[i], (p, x, y)
        assert rows[kk.TIMESTAMP, last] == ts
        # round flags one-hot per row
        first = p * kk.NUM_ROUNDS
        flags = rows[:kk.NUM_ROUNDS, first:first + kk.NUM_ROUNDS]
        assert (flags == np.eye(kk.NUM_ROUNDS, dtype=np.uint64)).all()


def test_constraints_hold_on_real_trace():
    rows = kk.generate_rows(_inputs())
    check_stark_constraints(kk.KeccakStark(), rows)


def test_constraints_hold_on_empty_trace():
    rows = kk.generate_rows([])
    check_stark_constraints(kk.KeccakStark(), rows)


def test_low_degree():
    check_stark_low_degree(kk.KeccakStark())


@pytest.mark.parametrize("tamper", ["rc", "chi_bit", "copy", "flag"])
def test_tamper_detected(tamper):
    rows = kk.generate_rows(_inputs(1))
    if tamper == "rc":
        # flip the iota output: claims a wrong round constant
        rows[kk.REG_A_PRIME_PRIME_PRIME_0_0_LO, 5] ^= 1
    elif tamper == "chi_bit":
        rows[kk.reg_a_prime(2, 3, 17), 7] ^= 1
    elif tamper == "copy":
        rows[kk.reg_a(1, 1), 12] += 1
    elif tamper == "flag":
        # swap round flags 3/4 on row 3 (breaks rotation / RC selection)
        rows[kk.reg_step(3), 3] = 0
        rows[kk.reg_step(4), 3] = 1
    violations = check_stark_constraints(kk.KeccakStark(), rows,
                                         raise_on_error=False)
    assert violations, f"tamper '{tamper}' not detected"
