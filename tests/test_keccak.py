"""Keccak: host keccak256 vs known vectors; device keccak-f vs host."""

import numpy as np

from zkm_tpu.hash.keccak import keccak256, keccak_f
from zkm_tpu.hash import keccak_device as kd


def test_keccak256_known_vectors():
    # Ethereum keccak256 test vectors
    assert keccak256(b"").hex() == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert keccak256(b"abc").hex() == \
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    # multi-block input (regression pin; first two vectors are the
    # well-known Ethereum keccak256 answers that anchor the implementation)
    assert keccak256(b"a" * 200).hex() == \
        "96ea54061def936c4be90b518992fdc6f12f535068a256229aca54267b4d084d"


def test_device_keccak_f_matches_host(rng):
    batch = 3
    lanes = rng.integers(0, 1 << 64, size=(batch, 25), dtype=np.uint64)
    lo = (lanes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (lanes >> np.uint64(32)).astype(np.uint32)
    out_lo, out_hi = kd.keccak_f_jit((lo, hi))
    out = np.asarray(out_lo, dtype=np.uint64) | \
        (np.asarray(out_hi, dtype=np.uint64) << np.uint64(32))
    for b in range(batch):
        want = keccak_f([int(x) for x in lanes[b]])
        assert [int(x) for x in out[b]] == want, b


def test_device_keccak_trace_shape(rng):
    lanes = rng.integers(0, 1 << 64, size=(2, 25), dtype=np.uint64)
    lo = (lanes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (lanes >> np.uint64(32)).astype(np.uint32)
    (flo, fhi), (rlo, rhi) = kd.keccak_f_trace((lo, hi))
    assert rlo.shape == (2, 24, 25)
    assert np.array_equal(np.asarray(rlo)[:, -1, :], np.asarray(flo))
