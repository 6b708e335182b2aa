"""Quadratic extension GF(p^2) = GF(p)[X]/(X^2 - 7).

Reference analog: plonky2 `QuadraticExtension<GoldilocksField>` (D=2), used
for STARK challenges/openings (SURVEY.md layer 0).  An extension element is a
pair of base elements ``(c0, c1)`` meaning c0 + c1*X.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl

Gf2 = Tuple[gl.Gf, gl.Gf]  # (c0, c1), each a (lo, hi) pair

W = gl.EXT_W  # 7
# Frobenius: X^p = DTH_ROOT * X with DTH_ROOT = W^((p-1)/2) = p-1 (i.e. -1).
DTH_ROOT = gl.EXT_DTH_ROOT


def zeros(shape) -> Gf2:
    return gl.zeros(shape), gl.zeros(shape)


def ones(shape) -> Gf2:
    return gl.ones(shape), gl.zeros(shape)


def from_base(a: gl.Gf) -> Gf2:
    return a, gl.zeros_like(a)


def from_u64_pair(c0, c1) -> Gf2:
    return gl.from_u64(c0), gl.from_u64(c1)


def to_u64(a: Gf2) -> Tuple[np.ndarray, np.ndarray]:
    return gl.to_u64(a[0]), gl.to_u64(a[1])


def add(a: Gf2, b: Gf2) -> Gf2:
    return gl.add(a[0], b[0]), gl.add(a[1], b[1])


def sub(a: Gf2, b: Gf2) -> Gf2:
    return gl.sub(a[0], b[0]), gl.sub(a[1], b[1])


def neg(a: Gf2) -> Gf2:
    return gl.neg(a[0]), gl.neg(a[1])


def mul(a: Gf2, b: Gf2) -> Gf2:
    a0b0 = gl.mul(a[0], b[0])
    a1b1 = gl.mul(a[1], b[1])
    a0b1 = gl.mul(a[0], b[1])
    a1b0 = gl.mul(a[1], b[0])
    c0 = gl.add(a0b0, gl.mul_small(a1b1, W))
    c1 = gl.add(a0b1, a1b0)
    return c0, c1


def mul_base(a: Gf2, b: gl.Gf) -> Gf2:
    return gl.mul(a[0], b), gl.mul(a[1], b)


def square(a: Gf2) -> Gf2:
    return mul(a, a)


def pow_const(a: Gf2, e: int) -> Gf2:
    assert e >= 0
    result = ones(a[0][0].shape)
    base = a
    while e:
        if e & 1:
            result = mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


def inverse(a: Gf2) -> Gf2:
    """1/(c0 + c1 X) = (c0 - c1 X) / (c0^2 - W c1^2)."""
    norm = gl.sub(gl.square(a[0]), gl.mul_small(gl.square(a[1]), W))
    ninv = gl.inverse(norm)
    return gl.mul(a[0], ninv), gl.neg(gl.mul(a[1], ninv))


def eq(a: Gf2, b: Gf2) -> jnp.ndarray:
    return gl.eq(a[0], b[0]) & gl.eq(a[1], b[1])


def is_zero(a: Gf2) -> jnp.ndarray:
    return gl.is_zero(a[0]) & gl.is_zero(a[1])


def select(mask, a: Gf2, b: Gf2) -> Gf2:
    return gl.select(mask, a[0], b[0]), gl.select(mask, a[1], b[1])


def scalar_from_u64s(c0: int, c1: int, shape=()) -> Gf2:
    return (gl.full(shape, c0), gl.full(shape, c1))


def stack(parts, axis=0) -> Gf2:
    return (gl.stack([p[0] for p in parts], axis=axis),
            gl.stack([p[1] for p in parts], axis=axis))


def getitem(a: Gf2, key) -> Gf2:
    return gl.getitem(a[0], key), gl.getitem(a[1], key)


def reshape(a: Gf2, shape) -> Gf2:
    return gl.reshape(a[0], shape), gl.reshape(a[1], shape)


def take(a: Gf2, idx, axis=0) -> Gf2:
    return gl.take(a[0], idx, axis=axis), gl.take(a[1], idx, axis=axis)


def sum_axis(a: Gf2, axis) -> Gf2:
    return gl.sum_axis(a[0], axis), gl.sum_axis(a[1], axis)


# Host-side scalar model (python ints): element = (int, int)

def host_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    return ((a0 * b0 + W * a1 * b1) % gl.P, (a0 * b1 + a1 * b0) % gl.P)


def host_inv(a):
    a0, a1 = a
    norm = (a0 * a0 - W * a1 * a1) % gl.P
    ninv = gl.host_inv(norm)
    return ((a0 * ninv) % gl.P, (-a1 * ninv) % gl.P)


def host_pow(a, e: int):
    result = (1, 0)
    base = a
    while e:
        if e & 1:
            result = host_mul(result, base)
        e >>= 1
        base = host_mul(base, base)
    return result
