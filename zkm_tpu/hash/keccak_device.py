"""Batched keccak-f[1600] on device: u64 lanes as uint32 pairs.

Reference analog: the keccak table's permutation (prover/src/keccak/) and
`cpu/kernel/keccak_util.rs` (u32-limbed keccakf).  Pure bitwise VPU work —
vectorized over any batch of states; the Keccak STARK's trace generation
runs 24 rounds of this kernel recording intermediate states.

State layout: (..., 25) uint32 pairs (lo, hi) per lane, A[x + 5y].
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .keccak import _ROUND_CONSTANTS, _ROTATIONS

U32 = jnp.uint32
Lanes = Tuple[jnp.ndarray, jnp.ndarray]  # (lo, hi) each (..., 25)

_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _ROUND_CONSTANTS],
                  dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _ROUND_CONSTANTS], dtype=np.uint32)

# pi permutation: out[y + 5*((2x+3y)%5)] = in[x + 5y] rotated
_PI_SRC = np.zeros(25, dtype=np.int32)
_ROT = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y
        _ROT[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _ROTATIONS[_x][_y]


def _rotl64(lo, hi, n: int):
    n %= 64
    if n == 0:
        return lo, hi
    if n == 32:
        return hi, lo
    if n < 32:
        return ((lo << n) | (hi >> (32 - n)),
                (hi << n) | (lo >> (32 - n)))
    n -= 32
    lo, hi = hi, lo
    return ((lo << n) | (hi >> (32 - n)),
            (hi << n) | (lo >> (32 - n)))


def _round(lo, hi, rc_lo, rc_hi):
    # theta
    def parity(v):
        # xor-reduce columns x over y: shape (..., 25) -> (..., 5)
        return (v[..., 0:5] ^ v[..., 5:10] ^ v[..., 10:15]
                ^ v[..., 15:20] ^ v[..., 20:25])

    c_lo, c_hi = parity(lo), parity(hi)
    d_parts_lo = []
    d_parts_hi = []
    for x in range(5):
        r_lo, r_hi = _rotl64(c_lo[..., (x + 1) % 5], c_hi[..., (x + 1) % 5], 1)
        d_parts_lo.append(c_lo[..., (x - 1) % 5] ^ r_lo)
        d_parts_hi.append(c_hi[..., (x - 1) % 5] ^ r_hi)
    # apply theta: a[x + 5y] ^= d[x]
    idx_mod5 = np.arange(25) % 5
    d_lo = jnp.stack(d_parts_lo, axis=-1)[..., idx_mod5]
    d_hi = jnp.stack(d_parts_hi, axis=-1)[..., idx_mod5]
    lo = lo ^ d_lo
    hi = hi ^ d_hi

    # rho + pi (static gathers + per-lane rotation)
    src_lo = lo[..., _PI_SRC]
    src_hi = hi[..., _PI_SRC]
    b_lo_parts, b_hi_parts = [], []
    for i in range(25):
        rl, rh = _rotl64(src_lo[..., i], src_hi[..., i], int(_ROT[i]))
        b_lo_parts.append(rl)
        b_hi_parts.append(rh)
    b_lo = jnp.stack(b_lo_parts, axis=-1)
    b_hi = jnp.stack(b_hi_parts, axis=-1)

    # chi: a[i] = b[i] ^ (~b[i+1 in row] & b[i+2 in row])
    i1 = np.array([(i % 5 + 1) % 5 + 5 * (i // 5) for i in range(25)])
    i2 = np.array([(i % 5 + 2) % 5 + 5 * (i // 5) for i in range(25)])
    lo = b_lo ^ ((~b_lo[..., i1]) & b_lo[..., i2])
    hi = b_hi ^ ((~b_hi[..., i1]) & b_hi[..., i2])

    # iota
    lo = lo.at[..., 0].set(lo[..., 0] ^ rc_lo)
    hi = hi.at[..., 0].set(hi[..., 0] ^ rc_hi)
    return lo, hi


def keccak_f(lanes: Lanes) -> Lanes:
    """24 rounds; returns final state."""
    lo, hi = lanes

    def step(carry, rc):
        lo, hi = carry
        lo, hi = _round(lo, hi, rc[0], rc[1])
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(
        step, (lo, hi), (jnp.asarray(_RC_LO), jnp.asarray(_RC_HI)))
    return lo, hi


def keccak_f_trace(lanes: Lanes) -> Tuple[Lanes, Lanes]:
    """Returns (final state, per-round states (..., 24, 25)) — the Keccak
    STARK commits one row per round."""
    lo, hi = lanes

    def step(carry, rc):
        lo, hi = carry
        lo, hi = _round(lo, hi, rc[0], rc[1])
        return (lo, hi), (lo, hi)

    (lo, hi), rounds = jax.lax.scan(
        step, (lo, hi), (jnp.asarray(_RC_LO), jnp.asarray(_RC_HI)))
    rounds_lo = jnp.moveaxis(rounds[0], 0, -2)
    rounds_hi = jnp.moveaxis(rounds[1], 0, -2)
    return (lo, hi), (rounds_lo, rounds_hi)


keccak_f_jit = jax.jit(keccak_f)
