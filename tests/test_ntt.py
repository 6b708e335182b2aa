"""NTT tests vs an exact python-int DFT oracle."""

import numpy as np
import pytest

from zkm_tpu.field import goldilocks as gl
from zkm_tpu.field import ntt

P = gl.P


def dft_oracle(coeffs, root):
    n = len(coeffs)
    return [sum(int(c) * pow(root, (i * k) % n, P) for k, c in enumerate(coeffs)) % P
            for i in range(n)]


def test_ntt_small_vs_dft(rng):
    for log_n in [1, 3, 4]:
        n = 1 << log_n
        coeffs = rng.integers(0, P, size=(2, n), dtype=np.uint64)
        root = gl.primitive_root_of_unity(log_n)
        got = gl.to_u64(ntt.ntt(gl.from_u64(coeffs)))
        for b in range(2):
            want = dft_oracle(coeffs[b], root)
            assert [int(x) for x in got[b]] == want, (log_n, b)


def test_intt_roundtrip(rng):
    coeffs = rng.integers(0, P, size=(3, 256), dtype=np.uint64)
    g = gl.from_u64(coeffs)
    back = gl.to_u64(ntt.intt(ntt.ntt(g)))
    assert np.array_equal(back, coeffs)


def test_coset_roundtrip_and_values(rng):
    n = 32
    coeffs = rng.integers(0, P, size=(1, n), dtype=np.uint64)
    g = gl.from_u64(coeffs)
    ev = gl.to_u64(ntt.coset_ntt(g))
    # oracle: evaluate at 7 * root^i
    root = gl.primitive_root_of_unity(5)
    for i in [0, 1, 17]:
        x = (7 * pow(root, i, P)) % P
        want = sum(int(c) * pow(x, k, P) for k, c in enumerate(coeffs[0])) % P
        assert int(ev[0][i]) == want
    back = gl.to_u64(ntt.coset_intt(gl.from_u64(ev)))
    assert np.array_equal(back, coeffs)


def test_lde_prefix_consistency(rng):
    # LDE of rate 4 evaluated on the coset includes the degree-n poly's
    # values; check against direct evaluation at a few points.
    n, rate_bits = 16, 2
    coeffs = rng.integers(0, P, size=(1, n), dtype=np.uint64)
    ev = gl.to_u64(ntt.lde(gl.from_u64(coeffs), rate_bits))
    assert ev.shape == (1, n << rate_bits)
    root = gl.primitive_root_of_unity(4 + rate_bits)
    for i in [0, 5, 63]:
        x = (7 * pow(root, i, P)) % P
        want = sum(int(c) * pow(x, k, P) for k, c in enumerate(coeffs[0])) % P
        assert int(ev[0][i]) == want


def test_eval_poly_and_powers(rng):
    coeffs = rng.integers(0, P, size=(2, 64), dtype=np.uint64)
    pt = rng.integers(0, P, dtype=np.uint64)
    got = gl.to_u64(ntt.eval_poly_base(gl.from_u64(coeffs), gl.from_u64(pt)))
    for b in range(2):
        want = sum(int(c) * pow(int(pt), k, P) for k, c in enumerate(coeffs[b])) % P
        assert int(got[b]) == want
    pws = gl.to_u64(ntt.powers(gl.from_u64(pt), 10))
    assert [int(x) for x in pws] == [pow(int(pt), k, P) for k in range(10)]
