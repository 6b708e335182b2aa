"""Goldilocks field tests vs an exact python-int oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from zkm_tpu.field import goldilocks as gl
from zkm_tpu.field import extension as gl2

P = gl.P


def rand_u64(rng, n):
    # Mix of uniform and adversarial values near p and 2^32 boundaries.
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    edge = np.array(
        [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, 0xFFFFFFFE00000001,
         P - 0xFFFFFFFF, (1 << 63), (1 << 63) - 1],
        dtype=np.uint64)
    vals[: len(edge)] = edge
    return vals


def test_roundtrip(rng):
    x = rand_u64(rng, 64)
    assert np.array_equal(gl.to_u64(gl.from_u64(x)), x)


def test_add_sub_neg(rng):
    a = rand_u64(rng, 256)
    b = rand_u64(rng, 256)
    ga, gb = gl.from_u64(a), gl.from_u64(b)
    want = (a.astype(object) + b.astype(object)) % P
    got = gl.to_u64(gl.add(ga, gb)).astype(object)
    assert np.array_equal(got, want)
    want = (a.astype(object) - b.astype(object)) % P
    got = gl.to_u64(gl.sub(ga, gb)).astype(object)
    assert np.array_equal(got, want)
    want = (-a.astype(object)) % P
    got = gl.to_u64(gl.neg(ga)).astype(object)
    assert np.array_equal(got, want)


def test_mul(rng):
    a = rand_u64(rng, 512)
    b = rand_u64(rng, 512)
    want = (a.astype(object) * b.astype(object)) % P
    got = gl.to_u64(gl.mul(gl.from_u64(a), gl.from_u64(b))).astype(object)
    assert np.array_equal(got, want)


def test_mul_jitted(rng):
    a = rand_u64(rng, 128)
    b = rand_u64(rng, 128)
    f = jax.jit(gl.mul)
    got = gl.to_u64(f(gl.from_u64(a), gl.from_u64(b))).astype(object)
    want = (a.astype(object) * b.astype(object)) % P
    assert np.array_equal(got, want)


def test_inverse(rng):
    a = rand_u64(rng, 64)
    a[a == 0] = 1
    inv = gl.inverse(gl.from_u64(a))
    prod = gl.to_u64(gl.mul(gl.from_u64(a), inv))
    assert np.all(prod == 1)
    # inverse(0) == 0
    z = gl.inverse(gl.zeros(()))
    assert gl.to_u64(z) == 0


def test_pow_const(rng):
    a = rand_u64(rng, 16)
    for e in [0, 1, 2, 3, 7, 65537]:
        want = np.array([pow(int(x), e, P) for x in a], dtype=object)
        got = gl.to_u64(gl.pow_const(gl.from_u64(a), e)).astype(object)
        assert np.array_equal(got, want)


def test_roots_of_unity():
    # POWER_OF_TWO_GENERATOR really is a primitive 2^32 root of unity.
    g = gl.POWER_OF_TWO_GENERATOR
    assert g == pow(gl.GENERATOR, (P - 1) >> 32, P)
    r16 = gl.primitive_root_of_unity(4)
    assert pow(r16, 16, P) == 1
    assert pow(r16, 8, P) == P - 1


def test_sum_axis(rng):
    a = rand_u64(rng, 7 * 5).reshape(7, 5)
    want = np.array(
        [sum(int(v) for v in row) % P for row in a], dtype=object)
    got = gl.to_u64(gl.sum_axis(gl.from_u64(a), axis=1)).astype(object)
    assert np.array_equal(got, want)
    want_cols = np.array(
        [sum(int(a[r, c]) for r in range(7)) % P for c in range(5)],
        dtype=object)
    got = gl.to_u64(gl.sum_axis(gl.from_u64(a), axis=0)).astype(object)
    assert np.array_equal(got, want_cols)


def test_extension_mul_inverse(rng):
    a0, a1 = rand_u64(rng, 32), rand_u64(rng, 32)
    b0, b1 = rand_u64(rng, 32), rand_u64(rng, 32)
    a0[0] = 5  # avoid the zero element (inverse undefined)
    ga = gl2.from_u64_pair(a0, a1)
    gb = gl2.from_u64_pair(b0, b1)
    got0, got1 = gl2.to_u64(gl2.mul(ga, gb))
    for i in range(32):
        w0, w1 = gl2.host_mul((int(a0[i]), int(a1[i])), (int(b0[i]), int(b1[i])))
        assert int(got0[i]) == w0 and int(got1[i]) == w1
    inv = gl2.inverse(ga)
    p0, p1 = gl2.to_u64(gl2.mul(ga, inv))
    assert np.all(p0 == 1) and np.all(p1 == 0)


def test_extension_frobenius():
    # X^p == DTH_ROOT * X, so a^p must equal (a0, DTH_ROOT*a1).
    a = gl2.scalar_from_u64s(123456789, 987654321)
    apow = gl2.host_pow((123456789, 987654321), P)
    assert apow == (123456789, (gl.EXT_DTH_ROOT * 987654321) % P)
    del a
