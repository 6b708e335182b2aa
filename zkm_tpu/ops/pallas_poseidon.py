"""Pallas TPU kernel: batched Poseidon permutation.

The Merkle-commitment leaf hashing runs millions of Poseidon permutations;
under plain XLA each round's state round-trips HBM.  This kernel keeps the
whole 30-round permutation in VMEM per batch tile.

Layout: states are (12, B) uint32 pairs — the batch rides the 128-wide lane
dimension, the 12 state elements ride sublanes, so the circulant MDS is
static sublane indexing.  Field math reuses the uint32-limb Goldilocks
kernels (zkm_tpu/field/goldilocks.py; Pallas TPU has no 64-bit integers).

Falls back to the jitted XLA path off-TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..hash import poseidon as ps
from ..hash import poseidon_constants as C

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_RC = np.array(C.ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(C.N_ROUNDS, 12)
_RC_LO = (_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)
_CIRC = list(C.MDS_MATRIX_CIRC)
_DIAG0 = C.MDS_MATRIX_DIAG[0]


def _mds_cols(state):
    """MDS on (12, B) state: out[r] = sum_i CIRC[i] * s[(r+i)%12] (+ diag).

    16-bit limb accumulation (exact, < 2^26), static sublane gathers.
    """
    lo, hi = state
    l0, l1 = lo & jnp.uint32(0xFFFF), lo >> 16
    l2, l3 = hi & jnp.uint32(0xFFFF), hi >> 16

    def circ(limb):
        outs = []
        for r in range(12):
            acc = limb[(r + 0) % 12] * jnp.uint32(_CIRC[0])
            for i in range(1, 12):
                acc = acc + limb[(r + i) % 12] * jnp.uint32(_CIRC[i])
            if r == 0:
                acc = acc + limb[0] * jnp.uint32(_DIAG0)
            outs.append(acc)
        return jnp.stack(outs, axis=0)

    o0, o1, o2, o3 = circ(l0), circ(l1), circ(l2), circ(l3)
    r0, c0 = gl._add32c(o0, (o1 & jnp.uint32(0xFFFF)) << 16)
    m1 = (o1 >> 16) + o2
    m1b, c1 = gl._add32c(m1, (o3 & jnp.uint32(0xFFFF)) << 16)
    r1, c2 = gl._add32c(m1b, c0)
    r2 = (o3 >> 16) + c1 + c2
    return gl._reduce128(r0, r1, r2, jnp.zeros_like(r2))


def _sbox(x):
    x2 = gl.square(x)
    x4 = gl.square(x2)
    return gl.mul(gl.mul(x4, x2), x)


def _permute_cols(state, rc_lo, rc_hi):
    """Full permutation on a (12, B) uint32-pair state (unrolled rounds).

    rc_lo/rc_hi: (30, 12) round-constant arrays (kernel inputs — Pallas
    forbids captured constants)."""
    h, p = C.HALF_N_FULL_ROUNDS, C.N_PARTIAL_ROUNDS
    for r in range(C.N_ROUNDS):
        rc = (rc_lo[r].reshape(12, 1), rc_hi[r].reshape(12, 1))
        state = gl.add(state, rc)
        if h <= r < h + p:
            row = _sbox((state[0][0:1], state[1][0:1]))
            # concat instead of .at[].set — Pallas TPU has no scatter
            state = (jnp.concatenate([row[0], state[0][1:]], axis=0),
                     jnp.concatenate([row[1], state[1][1:]], axis=0))
        else:
            state = _sbox(state)
        state = _mds_cols(state)
    return state


def _kernel(rc_lo_ref, rc_hi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    state = (lo_ref[...], hi_ref[...])
    out = _permute_cols(state, rc_lo_ref[...], rc_hi_ref[...])
    out_lo_ref[...] = out[0]
    out_hi_ref[...] = out[1]


@partial(jax.jit, static_argnums=(1,))
def permute_cols_pallas(state, block_b: int = 512):
    """state: (12, B) uint32 pair, B a multiple of block_b."""
    lo, hi = state
    b = lo.shape[1]
    assert b % block_b == 0, "batch must divide the block size"
    grid = (b // block_b,)
    spec = pl.BlockSpec((12, block_b), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((C.N_ROUNDS, 12), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_lo, out_hi = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[rc_spec, rc_spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct(lo.shape, jnp.uint32),
                   jax.ShapeDtypeStruct(hi.shape, jnp.uint32)),
    )(jnp.asarray(_RC_LO), jnp.asarray(_RC_HI), lo, hi)
    return out_lo, out_hi


def permute_batch(state, use_pallas: bool = None):
    """(B, 12) uint32-pair permutation, via the Pallas kernel on TPU.

    Transposes to the (12, B) lane-major layout internally."""
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and on_tpu
    if not use_pallas:
        return ps.permute_jit(state)
    lo, hi = state
    b = lo.shape[0]
    block = 512 if b % 512 == 0 else (128 if b % 128 == 0 else None)
    if block is None:
        return ps.permute_jit(state)
    out_lo, out_hi = permute_cols_pallas((lo.T, hi.T), block)
    return out_lo.T, out_hi.T
