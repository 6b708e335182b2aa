"""Poseidon permutation tests.

The key oracle: a pure-python implementation of the reference prover's
*optimized* permutation (fast partial rounds, using the
FAST_PARTIAL_ROUND_* matrices extracted from
/root/reference/prover/src/poseidon/constants.rs into
tests/data/poseidon_fast_constants.json).  The production JAX kernel uses the
naive partial-round form; agreement between the two on random states proves
the kernel computes the same permutation the reference prover does (the fast
matrices are derived from the naive parameters — they only agree if both are
right).
"""

import json
import os

import numpy as np

from zkm_tpu.field import goldilocks as gl
from zkm_tpu.hash import poseidon as ps
from zkm_tpu.hash import poseidon_constants as C

P = gl.P
HERE = os.path.dirname(__file__)

with open(os.path.join(HERE, "data", "poseidon_fast_constants.json")) as f:
    FAST = json.load(f)


def sbox(x):
    return pow(x, 7, P)


def mds_row(state, r):
    res = 0
    for i in range(12):
        res += state[(i + r) % 12] * C.MDS_MATRIX_CIRC[i]
    res += state[r] * C.MDS_MATRIX_DIAG[r]
    return res % P


def naive_python_permute(state):
    state = list(state)
    rc = C.ALL_ROUND_CONSTANTS
    r = 0
    for _ in range(4):
        state = [(s + rc[r * 12 + i]) % P for i, s in enumerate(state)]
        state = [sbox(s) for s in state]
        state = [mds_row(state, i) for i in range(12)]
        r += 1
    for _ in range(22):
        state = [(s + rc[r * 12 + i]) % P for i, s in enumerate(state)]
        state[0] = sbox(state[0])
        state = [mds_row(state, i) for i in range(12)]
        r += 1
    for _ in range(4):
        state = [(s + rc[r * 12 + i]) % P for i, s in enumerate(state)]
        state = [sbox(s) for s in state]
        state = [mds_row(state, i) for i in range(12)]
        r += 1
    return state


def fast_python_permute(state):
    """Replicates the reference's optimized partial-round evaluation."""
    state = list(state)
    rc = C.ALL_ROUND_CONSTANTS
    r = 0
    for _ in range(4):
        state = [(s + rc[r * 12 + i]) % P for i, s in enumerate(state)]
        state = [sbox(s) for s in state]
        state = [mds_row(state, i) for i in range(12)]
        r += 1
    # partial_first_constant_layer
    state = [(s + FAST["first_round_constant"][i]) % P
             for i, s in enumerate(state)]
    # mds_partial_layer_init
    result = [0] * 12
    result[0] = state[0]
    for row in range(1, 12):
        for col in range(1, 12):
            result[col] = (result[col]
                           + state[row] * FAST["initial_matrix"][row - 1][col - 1]) % P
    state = result
    for i in range(22):
        state[0] = sbox(state[0])
        state[0] = (state[0] + FAST["round_constants"][i]) % P
        # mds_partial_layer_fast
        d = state[0] * (C.MDS_MATRIX_CIRC[0] + C.MDS_MATRIX_DIAG[0])
        for row in range(1, 12):
            d += state[row] * FAST["w_hats"][i][row - 1]
        new = [d % P]
        for row in range(1, 12):
            new.append((state[row] + state[0] * FAST["vs"][i][row - 1]) % P)
        state = new
    r += 22
    for _ in range(4):
        state = [(s + rc[r * 12 + i]) % P for i, s in enumerate(state)]
        state = [sbox(s) for s in state]
        state = [mds_row(state, i) for i in range(12)]
        r += 1
    return state


def test_fast_equals_naive():
    rng = np.random.default_rng(1)
    for _ in range(3):
        state = [int(x) for x in rng.integers(0, P, size=12, dtype=np.uint64)]
        assert fast_python_permute(state) == naive_python_permute(state)
    assert fast_python_permute([0] * 12) == naive_python_permute([0] * 12)


def test_jax_permute_matches_python():
    rng = np.random.default_rng(2)
    batch = 5
    states = rng.integers(0, P, size=(batch, 12), dtype=np.uint64)
    states[0] = 0
    got = gl.to_u64(ps.permute_jit(gl.from_u64(states)))
    for b in range(batch):
        want = naive_python_permute([int(x) for x in states[b]])
        assert [int(x) for x in got[b]] == want, b


def test_hash_no_pad_and_two_to_one():
    rng = np.random.default_rng(3)
    inputs = rng.integers(0, P, size=(2, 11), dtype=np.uint64)
    out = gl.to_u64(ps.hash_no_pad(gl.from_u64(inputs)))
    assert out.shape == (2, 4)
    # python model: overwrite absorb in chunks of 8
    for b in range(2):
        state = [0] * 12
        chunk = [int(x) for x in inputs[b][:8]]
        state[:8] = chunk
        state = naive_python_permute(state)
        rest = [int(x) for x in inputs[b][8:]]
        state[: len(rest)] = rest
        state = naive_python_permute(state)
        assert [int(x) for x in out[b]] == state[:4]
    # two_to_one
    l = gl.from_u64(inputs[:, :4])
    r = gl.from_u64(inputs[:, 4:8])
    tt = gl.to_u64(ps.two_to_one(l, r))
    for b in range(2):
        state = [int(x) for x in inputs[b][:8]] + [0, 0, 0, 0]
        want = naive_python_permute(state)[:4]
        assert [int(x) for x in tt[b]] == want


def test_byte_sponge_pad_rules():
    # multiple-of-rate input: extra block, 1 at first byte, 0x80 at last.
    data = bytes(range(64))
    blocks = ps.bytes_to_rate_blocks(data)
    assert blocks.shape == (3, 8)
    pad = blocks[2]
    assert pad[0] == 1 and pad[7] == 0x80 << 24 and np.all(pad[1:7] == 0)
    # rate-1 length: both bits in one byte (0b10000001).
    data = bytes(31)
    blocks = ps.bytes_to_rate_blocks(data)
    assert blocks.shape == (1, 8)
    assert blocks[0][7] >> 24 == 0b10000001
    # digest consistency vs python model
    digest = ps.poseidon_bytes(bytes(range(40)))
    blocks = ps.bytes_to_rate_blocks(bytes(range(40)))
    state = [0] * 12
    for blk in blocks:
        state[:8] = [int(w) for w in blk]
        state = naive_python_permute(state)
    assert [int(x) for x in digest] == state[:4]


def test_permute_host_matches_device():
    rng = np.random.default_rng(7)
    state = [int(x) for x in rng.integers(0, P, size=12, dtype=np.uint64)]
    host = ps.permute_host(state)
    dev = gl.to_u64(ps.permute_jit(gl.from_u64(
        np.array(state, dtype=np.uint64))))
    assert host == [int(x) for x in dev]
    assert host == naive_python_permute(state)


def test_hash_pages_matches_byte_sponge():
    rng = np.random.default_rng(4)
    page = rng.integers(0, 2**32, size=1024, dtype=np.uint32)
    got = ps.hash_pages(page[None])
    want = ps.poseidon_bytes(page.astype("<u4").tobytes())
    assert np.array_equal(got[0], want)
