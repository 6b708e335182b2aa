"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1, as TPU-friendly uint32-pair arrays.

This is the base layer of the whole framework (reference analog: the plonky2
`GoldilocksField` used throughout /root/reference, e.g. prover/Cargo.toml:17-20).

Design (TPU-first):
  * An element is a pair of uint32 arrays ``(lo, hi)`` of identical shape,
    value = lo + hi * 2^32, always kept canonical (< p).  TPUs have no native
    64-bit integer multiply, so all arithmetic is built from 32x32 multiplies
    decomposed into 16-bit limbs — pure elementwise VPU work that XLA fuses.
  * All functions are shape-polymorphic, jittable, vmappable, and work
    identically on CPU and TPU (no x64 requirement).
  * Reduction strategy mirrors the standard Goldilocks `reduce128`:
    2^64 === 2^32 - 1 (mod p) ("EPSILON"), 2^96 === -1 (mod p).

A `Gf` element is just the tuple (lo, hi) — a valid JAX pytree.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
Gf = Tuple[jnp.ndarray, jnp.ndarray]  # (lo, hi) uint32 arrays

# p = 0xFFFFFFFF00000001
P = (1 << 64) - (1 << 32) + 1
P_LO = 1
P_HI = 0xFFFFFFFF
EPSILON = 0xFFFFFFFF  # 2^64 mod p == 2^32 - 1

# Multiplicative group generator and 2-adicity (protocol constants; the
# 2^32-th root of unity is g^((p-1)/2^32)).
GENERATOR = 7
TWO_ADICITY = 32
# 7^((p-1)/2^32) mod p — computed in scripts/check_constants.py; equals the
# plonky2 POWER_OF_TWO_GENERATOR.
POWER_OF_TWO_GENERATOR = 1753635133440165772

# Quadratic extension: x^2 = W (see extension.py).
EXT_W = 7
EXT_DTH_ROOT = 18446744069414584320  # == p - 1; Frobenius constant for D=2.


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=U32)


# When x64 is enabled (CPU test/prover processes), arithmetic internals use
# uint64 lanes: ~3x fewer HLO ops per field op, which keeps compiled
# constraint graphs small (XLA CPU compile time is the bottleneck; see
# project memory).  The public (lo, hi) uint32-pair API is unchanged, and
# the pure-u32 path remains for backends without 64-bit integers (TPU
# Pallas kernels use explicit u32 limbs anyway).

def _use_u64() -> bool:
    return bool(jax.config.jax_enable_x64)


_MASK64 = np.uint64(0xFFFFFFFF)


def _to64(a: Gf) -> jnp.ndarray:
    return a[0].astype(jnp.uint64) | (a[1].astype(jnp.uint64) << 32)


def _from64(x: jnp.ndarray) -> Gf:
    return ((x & _MASK64).astype(U32), (x >> 32).astype(U32))


# ---------------------------------------------------------------------------
# Host-side conversions (numpy, uint64) — for IO and tests.
# ---------------------------------------------------------------------------

def from_u64(x) -> Gf:
    """numpy/python uint64 array -> (lo, hi) device arrays (canonicalized)."""
    arr = np.asarray(x, dtype=np.uint64) % np.uint64(P)
    lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    return _u32(lo), _u32(hi)


def to_u64(a: Gf) -> np.ndarray:
    """(lo, hi) -> host numpy uint64 array.

    One pytree device_get: jax async-copies all leaves before blocking, so
    this costs ONE device->host round trip, not two (each trip is ~125 ms
    over a remote-TPU tunnel; the warm prove was transfer-latency-bound)."""
    lo, hi = jax.device_get((a[0], a[1]))
    return np.asarray(lo, dtype=np.uint64) | \
        (np.asarray(hi, dtype=np.uint64) << np.uint64(32))


def to_u64_many(gfs) -> list:
    """Fetch MANY Gf values in one device->host round trip (the transfers
    overlap; see to_u64).  Returns a list of u64 arrays."""
    host = jax.device_get([(g[0], g[1]) for g in gfs])
    return [np.asarray(lo, dtype=np.uint64)
            | (np.asarray(hi, dtype=np.uint64) << np.uint64(32))
            for lo, hi in host]


def zeros(shape) -> Gf:
    return jnp.zeros(shape, U32), jnp.zeros(shape, U32)


def ones(shape) -> Gf:
    return jnp.ones(shape, U32), jnp.zeros(shape, U32)


def full(shape, value: int) -> Gf:
    value %= P
    return (jnp.full(shape, value & 0xFFFFFFFF, U32),
            jnp.full(shape, value >> 32, U32))


def from_u32(x) -> Gf:
    """uint32 array -> field element (always canonical since < 2^32 <= p)."""
    x = _u32(x)
    return x, jnp.zeros_like(x)


# ---------------------------------------------------------------------------
# 64-bit primitive ops on uint32 pairs.
# ---------------------------------------------------------------------------

def _add32c(a, b):
    s = a + b
    return s, (s < a).astype(U32)


def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 plus carry-out (0/1)."""
    lo, c0 = _add32c(alo, blo)
    hi1, c1 = _add32c(ahi, bhi)
    hi, c2 = _add32c(hi1, c0)
    return lo, hi, c1 + c2


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 plus borrow-out (0/1)."""
    lo = alo - blo
    b0 = (alo < blo).astype(U32)
    hi1 = ahi - bhi
    b1 = (ahi < bhi).astype(U32)
    hi = hi1 - b0
    b2 = (hi1 < b0).astype(U32)
    return lo, hi, b1 + b2


def _mul32_wide(a, b):
    """32x32 -> 64 multiply: returns (lo32, hi32)."""
    al = a & jnp.uint32(0xFFFF)
    ah = a >> 16
    bl = b & jnp.uint32(0xFFFF)
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid, midc = _add32c(lh, hl)
    lo, c1 = _add32c(ll, mid << 16)
    hi = hh + (mid >> 16) + (midc << 16) + c1
    return lo, hi


def _mul64_wide(alo, ahi, blo, bhi):
    """64x64 -> 128 multiply: returns (r0, r1, r2, r3) 32-bit limbs."""
    p00l, p00h = _mul32_wide(alo, blo)
    p01l, p01h = _mul32_wide(alo, bhi)
    p10l, p10h = _mul32_wide(ahi, blo)
    p11l, p11h = _mul32_wide(ahi, bhi)
    r0 = p00l
    t, c0 = _add32c(p00h, p01l)
    r1, c1 = _add32c(t, p10l)
    carry1 = c0 + c1
    t, c0 = _add32c(p01h, p10h)
    t2, c1 = _add32c(t, p11l)
    r2, c2 = _add32c(t2, carry1)
    carry2 = c0 + c1 + c2
    r3 = p11h + carry2
    return r0, r1, r2, r3


def _ge_p(lo, hi):
    return (hi == jnp.uint32(P_HI)) & (lo != 0)


def _canonicalize(lo, hi):
    """Conditional subtract of p for values < 2^64."""
    ge = _ge_p(lo, hi)
    slo, shi, _ = _sub64(lo, hi, jnp.uint32(P_LO), jnp.uint32(P_HI))
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


def _reduce128(r0, r1, r2, r3) -> Gf:
    """Reduce a 128-bit value (4x32 limbs) mod p, canonical output.

    Uses 2^64 == EPSILON, 2^96 == -1 (mod p):
      n == n_lo - n_hi_hi + n_hi_lo * EPSILON (mod p).
    """
    # t0 = n_lo - r3  (borrow => wrapped; fix by subtracting EPSILON)
    t0lo, t0hi, br = _sub64(r0, r1, r3, jnp.zeros_like(r3))
    # when borrow: t0 -= EPSILON (no second borrow possible: wrapped t0 >= 2^64-2^32)
    fl, fh, _ = _sub64(t0lo, t0hi, jnp.uint32(EPSILON), jnp.zeros_like(t0hi))
    t0lo = jnp.where(br != 0, fl, t0lo)
    t0hi = jnp.where(br != 0, fh, t0hi)
    # t1 = r2 * EPSILON = (r2 << 32) - r2
    nz = (r2 != 0)
    t1lo = jnp.where(nz, jnp.uint32(0) - r2, jnp.uint32(0))
    t1hi = jnp.where(nz, r2 - 1, jnp.uint32(0))
    # t2 = t0 + t1 (carry => add EPSILON, no second carry possible)
    lo, hi, c = _add64(t0lo, t0hi, t1lo, t1hi)
    alo, ac = _add32c(lo, jnp.uint32(EPSILON))
    ahi = hi + ac
    lo = jnp.where(c != 0, alo, lo)
    hi = jnp.where(c != 0, ahi, hi)
    return _canonicalize(lo, hi)


# ---------------------------------------------------------------------------
# Field operations. All inputs assumed canonical; outputs canonical.
# ---------------------------------------------------------------------------

def add(a: Gf, b: Gf) -> Gf:
    if _use_u64():
        x, y = _to64(a), _to64(b)
        s = x + y
        carried = s < x
        s = jnp.where(carried, s + np.uint64(EPSILON), s)
        s = jnp.where(s >= np.uint64(P), s - np.uint64(P), s)
        return _from64(s)
    lo, hi, c = _add64(a[0], a[1], b[0], b[1])
    # carry: value-2^64 +EPSILON == value - p; result < p so no re-canonicalize
    alo, ac = _add32c(lo, jnp.uint32(EPSILON))
    ahi = hi + ac
    lo = jnp.where(c != 0, alo, lo)
    hi = jnp.where(c != 0, ahi, hi)
    return _canonicalize(lo, hi)


def sub(a: Gf, b: Gf) -> Gf:
    if _use_u64():
        x, y = _to64(a), _to64(b)
        d = x - y
        d = jnp.where(x < y, d - np.uint64(EPSILON), d)
        return _from64(d)
    lo, hi, br = _sub64(a[0], a[1], b[0], b[1])
    # borrow: wrapped value = a-b+2^64; want a-b+p = wrapped - EPSILON
    flo, fhi, _ = _sub64(lo, hi, jnp.uint32(EPSILON), jnp.zeros_like(hi))
    lo = jnp.where(br != 0, flo, lo)
    hi = jnp.where(br != 0, fhi, hi)
    return lo, hi


def neg(a: Gf) -> Gf:
    return sub(zeros_like(a), a)


def zeros_like(a: Gf) -> Gf:
    return jnp.zeros_like(a[0]), jnp.zeros_like(a[1])


def mul(a: Gf, b: Gf) -> Gf:
    if _use_u64():
        x, y = _to64(a), _to64(b)
        lo64 = x * y
        # high 64 bits via 32-bit half products (all exact in u64)
        xl, xh = x & _MASK64, x >> 32
        yl, yh = y & _MASK64, y >> 32
        ll = xl * yl
        lh = xl * yh
        hl = xh * yl
        # mid = hl + (ll >> 32) + (lh & mask): < 2^64, no overflow
        mid = hl + (ll >> 32) + (lh & _MASK64)
        hi64 = xh * yh + (mid >> 32) + (lh >> 32)
        # reduce128: n == n_lo - n_hi_hi + n_hi_lo * EPSILON (mod p)
        hi_hi = hi64 >> 32
        hi_lo = hi64 & _MASK64
        t0 = lo64 - hi_hi
        t0 = jnp.where(lo64 < hi_hi, t0 - np.uint64(EPSILON), t0)
        t1 = hi_lo * np.uint64(EPSILON)
        t2 = t0 + t1
        t2 = jnp.where(t2 < t0, t2 + np.uint64(EPSILON), t2)
        t2 = jnp.where(t2 >= np.uint64(P), t2 - np.uint64(P), t2)
        return _from64(t2)
    r = _mul64_wide(a[0], a[1], b[0], b[1])
    return _reduce128(*r)


def square(a: Gf) -> Gf:
    return mul(a, a)


def mul_small(a: Gf, c: int) -> Gf:
    """Multiply by a small (< 2^32) constant."""
    return mul(a, full(a[0].shape, c))


def double(a: Gf) -> Gf:
    return add(a, a)


def pow_const(a: Gf, e: int) -> Gf:
    """a^e for a Python-int exponent.

    Small exponents unroll (lets XLA fuse, e.g. the Poseidon x^7 sbox);
    large exponents use a rolled `lax.scan` over the exponent bits — the
    unrolled ~126-multiply chain of a^(p-2) makes XLA CPU's LLVM take
    minutes per enclosing fusion (see project memory), while the rolled
    form is a ~200-op graph with identical math."""
    assert e >= 0
    if e.bit_length() <= 8:
        result = ones(a[0].shape)
        base = a
        while e:
            if e & 1:
                result = mul(result, base)
            e >>= 1
            if e:
                base = square(base)
        return result

    nbits = e.bit_length()
    bits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32))

    def step(carry, bit):
        result, base = carry
        result = select(bit == 1, mul(result, base), result)
        base = square(base)
        return (result, base), None

    init = (ones(a[0].shape), a)
    (result, _), _ = jax.lax.scan(step, init, bits)
    return result


def inverse(a: Gf) -> Gf:
    """a^(p-2); fully data-parallel (no sequential Montgomery chain).

    0 maps to 0 (callers must handle zero separately when it matters).
    """
    return pow_const(a, P - 2)


def eq(a: Gf, b: Gf) -> jnp.ndarray:
    return (a[0] == b[0]) & (a[1] == b[1])


def is_zero(a: Gf) -> jnp.ndarray:
    return (a[0] == 0) & (a[1] == 0)


def select(mask: jnp.ndarray, a: Gf, b: Gf) -> Gf:
    """Elementwise where(mask, a, b)."""
    return jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1])


# ---------------------------------------------------------------------------
# Shape helpers (treat (lo, hi) uniformly).
# ---------------------------------------------------------------------------

def gmap(fn, a: Gf) -> Gf:
    return fn(a[0]), fn(a[1])


def reshape(a: Gf, shape) -> Gf:
    return a[0].reshape(shape), a[1].reshape(shape)


def concatenate(parts, axis=0) -> Gf:
    return (jnp.concatenate([p[0] for p in parts], axis=axis),
            jnp.concatenate([p[1] for p in parts], axis=axis))


def stack(parts, axis=0) -> Gf:
    return (jnp.stack([p[0] for p in parts], axis=axis),
            jnp.stack([p[1] for p in parts], axis=axis))


def take(a: Gf, idx, axis=0) -> Gf:
    return (jnp.take(a[0], idx, axis=axis), jnp.take(a[1], idx, axis=axis))


def dynamic_index(a: Gf, i, axis=0) -> Gf:
    lo = jax.lax.dynamic_index_in_dim(a[0], i, axis=axis, keepdims=False)
    hi = jax.lax.dynamic_index_in_dim(a[1], i, axis=axis, keepdims=False)
    return lo, hi


def getitem(a: Gf, key) -> Gf:
    return a[0][key], a[1][key]


def set_at(a: Gf, key, value: Gf) -> Gf:
    return a[0].at[key].set(value[0]), a[1].at[key].set(value[1])


def sum_axis(a: Gf, axis) -> Gf:
    """Modular sum along an axis via a log-depth halving tree.

    Deliberately concatenate-free (zero-padding to a power of two instead):
    XLA CPU's LLVM hangs on concat fusions of deep elementwise producers.
    """
    axis = axis % a[0].ndim
    n = a[0].shape[axis]
    if n == 1:
        return (jnp.squeeze(a[0], axis=axis), jnp.squeeze(a[1], axis=axis))
    target = 1 << (n - 1).bit_length()
    if target != n:
        pad = [(0, 0)] * a[0].ndim
        pad[axis] = (0, target - n)
        a = (jnp.pad(a[0], pad), jnp.pad(a[1], pad))
        n = target
    cur = a
    while n > 1:
        half = n // 2
        first = getitem(cur, tuple(
            slice(0, half) if d == axis else slice(None)
            for d in range(cur[0].ndim)))
        second = getitem(cur, tuple(
            slice(half, n) if d == axis else slice(None)
            for d in range(cur[0].ndim)))
        cur = add(first, second)
        n = half
    return (jnp.squeeze(cur[0], axis=axis), jnp.squeeze(cur[1], axis=axis))


# ---------------------------------------------------------------------------
# Host-side (numpy, python-int) scalar field math for twiddle tables etc.
# ---------------------------------------------------------------------------

def host_mul(a: int, b: int) -> int:
    return (a * b) % P


def host_pow(a: int, e: int) -> int:
    return pow(a, e, P)


def host_inv(a: int) -> int:
    return pow(a, P - 2, P)


def primitive_root_of_unity(n_log: int) -> int:
    """2^n_log-th primitive root of unity (plonky2-compatible subgroup)."""
    assert 0 <= n_log <= TWO_ADICITY
    root = POWER_OF_TWO_GENERATOR
    for _ in range(TWO_ADICITY - n_log):
        root = (root * root) % P
    return root


def host_powers(base: int, n: int) -> np.ndarray:
    """[1, base, base^2, ...] as numpy uint64 of length n."""
    out = np.empty(n, dtype=np.uint64)
    cur = 1
    for i in range(n):
        out[i] = cur
        cur = (cur * base) % P
    return out
