"""Poseidon permutation + sponges over Goldilocks, batched for TPU.

Replicates (bit-exactly, by construction) the reference's two Poseidon uses:
  * the plonky2-style hash API (`hash_n_to_m_no_pad`, `two_to_one`,
    `hash_or_noop`) used for Merkle commitments and the Fiat-Shamir
    challenger (reference layer 0);
  * the emulator's byte-oriented pad10*1 sponge used for page hashing /
    image ids (/root/reference/emulator/src/memory.rs:43-89).

All device functions are batched over leading dims: a state is a Gf pair of
shape (..., 12).  The naive partial-round evaluation is used — it is
mathematically identical to the reference's fast-partial-round optimization
(same constants, same permutation output).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from . import poseidon_constants as C

SPONGE_RATE = C.SPONGE_RATE       # 8 field elements
SPONGE_WIDTH = C.SPONGE_WIDTH     # 12
DIGEST = 4                        # hash output = 4 field elements
RATE_BYTES = SPONGE_RATE * 4      # byte-sponge absorbs 32 bytes per block

# --- precomputed tables (host) ---------------------------------------------

_RC = np.array(C.ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(C.N_ROUNDS, 12)
_RC_LO = jnp.asarray((_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32))
_RC_HI = jnp.asarray((_RC >> np.uint64(32)).astype(np.uint32))

_MDS_CIRC = tuple(C.MDS_MATRIX_CIRC)
_MDS_DIAG0 = C.MDS_MATRIX_DIAG[0]  # only row 0 has a diagonal term
# Gather index: _MDS_IDX[r, i] = (r + i) % 12, so out[r] = sum_i C[i]*s[idx].
_MDS_IDX = jnp.asarray(
    (np.arange(12)[:, None] + np.arange(12)[None, :]) % 12, dtype=np.int32)
_MDS_CIRC_ARR = jnp.asarray(np.array(C.MDS_MATRIX_CIRC, dtype=np.uint32))


def _sbox(x: gl.Gf) -> gl.Gf:
    """x^7 (4 field muls)."""
    x2 = gl.square(x)
    x4 = gl.square(x2)
    x6 = gl.mul(x4, x2)
    return gl.mul(x6, x)


def _constant_layer(state: gl.Gf, r: int) -> gl.Gf:
    rc = (_RC_LO[r], _RC_HI[r])  # (12,)
    return gl.add(state, rc)


def _mds_layer(state: gl.Gf) -> gl.Gf:
    """Circulant MDS via 16-bit limb integer matmul (exact, overflow-free).

    Limbs < 2^16, matrix entries <= 49, so each of the 12-term dot products
    is < 2^26 and fits uint32; the 4 limb-sums are then recombined into a
    128-bit value and reduced mod p.
    """
    lo, hi = state  # (..., 12)

    # Per 16-bit limb: gather the 12 circulant operands then weighted-reduce.
    # out_k[..., r] = sum_i CIRC[i] * limb_k[..., (r+i)%12] (+ diag at r=0).
    # Gather + multiply + reduce only — deliberately NO concatenate/roll ops:
    # XLA CPU's LLVM pipeline hangs on large concatenate-fusion kernels.
    def circ(limb):
        g = limb[..., _MDS_IDX]                      # (..., 12, 12)
        # dtype pinned: under x64 jnp.sum would promote uint32 -> uint64
        acc = jnp.sum(g * _MDS_CIRC_ARR, axis=-1,
                      dtype=jnp.uint32)              # < 2^26, fits uint32
        return acc.at[..., 0].add(limb[..., 0] * jnp.uint32(_MDS_DIAG0))

    o0 = circ(lo & jnp.uint32(0xFFFF))
    o1 = circ(lo >> 16)
    o2 = circ(hi & jnp.uint32(0xFFFF))
    o3 = circ(hi >> 16)
    # Recombine o0 + o1*2^16 + o2*2^32 + o3*2^48 into 32-bit limbs r0..r2.
    r0, c0 = gl._add32c(o0, (o1 & jnp.uint32(0xFFFF)) << 16)
    m1 = (o1 >> 16) + o2                       # < 2^27, no overflow
    m1b, c1 = gl._add32c(m1, (o3 & jnp.uint32(0xFFFF)) << 16)
    r1, c2 = gl._add32c(m1b, c0)
    r2 = (o3 >> 16) + c1 + c2                  # < 2^11
    r3 = jnp.zeros_like(r2)
    return gl._reduce128(r0, r1, r2, r3)


def _full_round(state: gl.Gf, rc: gl.Gf) -> gl.Gf:
    return _mds_layer(_sbox(gl.add(state, rc)))


def _partial_round(state: gl.Gf, rc: gl.Gf) -> gl.Gf:
    state = gl.add(state, rc)
    s0 = _sbox(gl.getitem(state, (Ellipsis, slice(0, 1))))
    state = (state[0].at[..., 0:1].set(s0[0]),
             state[1].at[..., 0:1].set(s0[1]))
    return _mds_layer(state)


PALLAS_CHUNK = 1 << 14


def permute(state: gl.Gf) -> gl.Gf:
    """The full 30-round Poseidon permutation on (..., 12) states.

    On TPU, large 2-D batches dispatch to the Pallas kernel
    (zkm_tpu/ops/pallas_poseidon.py; ~5.5x the XLA path — the whole
    permutation stays in VMEM) — always at ONE fixed chunk shape
    (PALLAS_CHUNK, 12) via lax.map: every distinct Pallas shape costs
    ~30 s of uncached Mosaic lowering per process, so a 2^18-leaf Merkle
    build with per-level shapes paid minutes of compile for milliseconds
    of math.  Batches below the chunk take the XLA scan path (fast to
    compile, adequate at small sizes).
    """
    from ..utils import hostjit
    lo = state[0]
    if lo.ndim == 2 and not hostjit.ON_HOST.get() \
            and jax.default_backend() == "tpu":
        # small batches pad up to one chunk: the wasted permutes cost ~1ms,
        # while the XLA scan path costs ~166s of TPU compile per shape
        from ..ops import pallas_poseidon
        b = lo.shape[0]
        padded = -b % PALLAS_CHUNK
        if padded:
            cfg = [(0, padded), (0, 0)]
            state = (jnp.pad(lo, cfg), jnp.pad(state[1], cfg))
        m = state[0].shape[0]
        if m == PALLAS_CHUNK:
            out = pallas_poseidon.permute_batch(state, use_pallas=True)
        else:
            chunked = (state[0].reshape(m // PALLAS_CHUNK, PALLAS_CHUNK, 12),
                       state[1].reshape(m // PALLAS_CHUNK, PALLAS_CHUNK, 12))
            out = jax.lax.map(
                lambda s: pallas_poseidon.permute_batch(s, use_pallas=True),
                chunked)
            out = (out[0].reshape(m, 12), out[1].reshape(m, 12))
        if padded:
            out = (out[0][:b], out[1][:b])
        return out
    h = C.HALF_N_FULL_ROUNDS
    p = C.N_PARTIAL_ROUNDS

    def scan_rounds(state, rc_slice, body):
        def step(st, rc):
            return body(st, rc), None
        state, _ = jax.lax.scan(step, state, rc_slice)
        return state

    state = scan_rounds(state, (_RC_LO[:h], _RC_HI[:h]), _full_round)
    state = scan_rounds(
        state, (_RC_LO[h:h + p], _RC_HI[h:h + p]), _partial_round)
    state = scan_rounds(state, (_RC_LO[h + p:], _RC_HI[h + p:]), _full_round)
    return state


permute_jit = jax.jit(permute)


# ---------------------------------------------------------------------------
# plonky2-style hashing (overwrite-mode sponge, no padding).
# ---------------------------------------------------------------------------

def hash_n_to_m_no_pad(inputs: gl.Gf, num_outputs: int) -> gl.Gf:
    """inputs: (..., n) field elements; returns (..., num_outputs).

    Absorb in chunks of 8 by overwriting the rate portion, permuting after
    each chunk; squeeze from the first 8 state elements.
    """
    lo, hi = inputs
    n = lo.shape[-1]
    batch = lo.shape[:-1]
    state = gl.zeros(batch + (SPONGE_WIDTH,))
    for start in range(0, n, SPONGE_RATE):
        end = min(start + SPONGE_RATE, n)
        w = end - start
        state = (state[0].at[..., :w].set(lo[..., start:end]),
                 state[1].at[..., :w].set(hi[..., start:end]))
        state = permute(state)
    outs = []
    produced = 0
    while True:
        take = min(SPONGE_RATE, num_outputs - produced)
        outs.append(gl.getitem(state, (Ellipsis, slice(0, take))))
        produced += take
        if produced == num_outputs:
            break
        state = permute(state)
    return gl.concatenate(outs, axis=-1)


def hash_no_pad(inputs: gl.Gf) -> gl.Gf:
    return hash_n_to_m_no_pad(inputs, DIGEST)


def hash_or_noop(inputs: gl.Gf) -> gl.Gf:
    """(..., n) -> (..., 4): zero-padded identity if n <= 4, else hash.

    Shape-static, so the branch resolves at trace time (matches plonky2's
    `hash_or_noop` leaf rule).
    """
    lo, hi = inputs
    n = lo.shape[-1]
    if n <= DIGEST:
        pad = DIGEST - n
        return (jnp.pad(lo, [(0, 0)] * (lo.ndim - 1) + [(0, pad)]),
                jnp.pad(hi, [(0, 0)] * (hi.ndim - 1) + [(0, pad)]))
    return hash_no_pad(inputs)


def two_to_one(left: gl.Gf, right: gl.Gf) -> gl.Gf:
    """Compress two (..., 4) digests into one (overwrite sponge, 1 permute)."""
    batch = left[0].shape[:-1]
    state = gl.zeros(batch + (SPONGE_WIDTH,))
    state = (state[0].at[..., 0:4].set(left[0]).at[..., 4:8].set(right[0]),
             state[1].at[..., 0:4].set(left[1]).at[..., 4:8].set(right[1]))
    out = permute(state)
    return gl.getitem(out, (Ellipsis, slice(0, DIGEST)))


# ---------------------------------------------------------------------------
# Emulator byte sponge (pad10*1 over 32-byte rate blocks, LE u32 words).
# Reference: /root/reference/emulator/src/memory.rs:43-79.
# ---------------------------------------------------------------------------

def bytes_to_rate_blocks(data: bytes) -> np.ndarray:
    """Pad10*1 and pack into (num_blocks, 8) uint32 LE words (host-side)."""
    l = len(data)
    chunks = l // RATE_BYTES + 1
    buf = bytearray(data)
    buf.extend(b"\x00" * (chunks * RATE_BYTES - l))
    if l % RATE_BYTES == RATE_BYTES - 1:
        buf[l] = 0b10000001
    else:
        buf[l] = 1
        buf[chunks * RATE_BYTES - 1] = 0b10000000
    return np.frombuffer(bytes(buf), dtype="<u4").reshape(chunks, 8)


def absorb_rate_blocks(blocks: jnp.ndarray) -> gl.Gf:
    """blocks: (..., nblocks, 8) uint32 -> digest (..., 4) field elements.

    Overwrite-mode absorb of each 8-word block followed by a permutation;
    digest = first 4 state elements.  The block count is static.
    """
    blocks = jnp.asarray(blocks, dtype=jnp.uint32)
    nblocks = blocks.shape[-2]
    batch = blocks.shape[:-2]
    state = gl.zeros(batch + (SPONGE_WIDTH,))

    def step(state, block):
        st = (state[0].at[..., :SPONGE_RATE].set(block),
               state[1].at[..., :SPONGE_RATE].set(jnp.zeros_like(block)))
        st = permute(st)
        return st, None

    # moveaxis so scan runs over the block axis.
    blocks_t = jnp.moveaxis(blocks, -2, 0)
    state, _ = jax.lax.scan(step, state, blocks_t)
    return gl.getitem(state, (Ellipsis, slice(0, DIGEST)))


# Host-side byte sponges (page hashing, witness image ids) are
# latency-bound; pin them to the CPU backend (see utils/hostjit.py).
from ..utils.hostjit import host_jit

_absorb_jit = host_jit(absorb_rate_blocks)


def poseidon_bytes(data: bytes) -> np.ndarray:
    """Host convenience: full byte sponge -> 4 uint64 digest words."""
    blocks = bytes_to_rate_blocks(data)
    return gl.to_u64(_absorb_jit(blocks))


def sponge_chain_states(blocks: jnp.ndarray):
    """(..., nb, 8) u32 blocks -> (inputs (..., nb, 12), final (..., 12)).

    `inputs[..., b, :]` is the permutation INPUT state of block b (rate
    words overwritten, capacity carried) — exactly what the Poseidon
    table's witness rows record; `final` is the last permutation's output
    (digest = final[..., :DIGEST]).  Batched over leading axes so ALL
    page sponges of a segment run as one dispatch (the per-page
    permute_host chain was 88%% of witness generation wall-clock)."""
    blocks = jnp.asarray(blocks, dtype=jnp.uint32)
    batch = blocks.shape[:-2]
    state = gl.zeros(batch + (SPONGE_WIDTH,))

    def step(state, block):
        st = (state[0].at[..., :SPONGE_RATE].set(block),
              state[1].at[..., :SPONGE_RATE].set(jnp.zeros_like(block)))
        return permute(st), st

    blocks_t = jnp.moveaxis(blocks, -2, 0)
    final, inputs = jax.lax.scan(step, state, blocks_t)
    inputs = (jnp.moveaxis(inputs[0], 0, -2),
              jnp.moveaxis(inputs[1], 0, -2))
    return inputs, final


_sponge_chain_jit = host_jit(sponge_chain_states)


def sponge_chains_u64(blocks: np.ndarray):
    """Host entry: (P, nb, 8) u32 -> (inputs (P, nb, 12) u64,
    final (P, 12) u64) in ONE dispatch + one fetch."""
    inputs, final = _sponge_chain_jit(blocks)
    i64, f64 = gl.to_u64_many([inputs, final])
    return i64, f64


# ---------------------------------------------------------------------------
# Pure-python permutation (host transcript path).
#
# The Fiat-Shamir challenger and per-query Merkle path checks are scalar and
# sequential; going through jitted device calls costs ~1ms of dispatch per
# permutation and pollutes the jit caches.  This int-based implementation is
# bit-identical (same naive round structure as `permute`).
# ---------------------------------------------------------------------------

_P = gl.P
_RC_INT = [[int(x) for x in row] for row in _RC]
_MDS_CIRC_INT = list(C.MDS_MATRIX_CIRC)
_MDS_DIAG0_INT = C.MDS_MATRIX_DIAG[0]


def permute_host(state):
    """[12 ints] -> [12 ints]; same permutation as `permute`."""
    s = [int(x) for x in state]
    for r in range(C.N_ROUNDS):
        rc = _RC_INT[r]
        is_full = r < C.HALF_N_FULL_ROUNDS or \
            r >= C.HALF_N_FULL_ROUNDS + C.N_PARTIAL_ROUNDS
        s = [(v + rc[i]) % _P for i, v in enumerate(s)]
        if is_full:
            s = [pow(v, 7, _P) for v in s]
        else:
            s[0] = pow(s[0], 7, _P)
        out = []
        for row in range(12):
            acc = 0
            for i in range(12):
                acc += _MDS_CIRC_INT[i] * s[(i + row) % 12]
            if row == 0:
                acc += _MDS_DIAG0_INT * s[0]
            out.append(acc % _P)
        s = out
    return s


def hash_no_pad_host(values):
    """[ints] -> 4-int digest (plonky2 hash_n_to_hash_no_pad, host)."""
    state = [0] * SPONGE_WIDTH
    vals = [int(v) for v in values]
    for start in range(0, len(vals), SPONGE_RATE):
        chunk = vals[start:start + SPONGE_RATE]
        state[:len(chunk)] = chunk
        state = permute_host(state)
    return state[:DIGEST]


def hash_or_noop_host(values):
    vals = [int(v) for v in values]
    if len(vals) <= DIGEST:
        return vals + [0] * (DIGEST - len(vals))
    return hash_no_pad_host(vals)


def two_to_one_host(left, right):
    state = [int(x) for x in left] + [int(x) for x in right] + [0, 0, 0, 0]
    return permute_host(state)[:DIGEST]


def hash_pages(pages_u32: np.ndarray) -> np.ndarray:
    """Batch page hashing: (npages, 1024) uint32 LE words -> (npages, 4) u64.

    A 4096-byte page is a multiple of the rate, so padding appends one extra
    all-zero block with first byte 0x01 and last byte 0x80 (pad10*1 with the
    two bits in different bytes).
    """
    pages_u32 = np.asarray(pages_u32, dtype=np.uint32).reshape(-1, 1024)
    npages = pages_u32.shape[0]
    blocks = pages_u32.reshape(npages, 128, 8)
    pad_block = np.zeros((npages, 1, 8), dtype=np.uint32)
    pad_block[:, 0, 0] = 1
    pad_block[:, 0, 7] = 0x80 << 24  # last byte of the 32-byte block (LE)
    blocks = np.concatenate([blocks, pad_block], axis=1)
    return gl.to_u64(_absorb_jit(blocks))
