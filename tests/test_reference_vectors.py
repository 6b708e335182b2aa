"""External reference vectors (VERDICT r3 items 7 and 8).

Unlike tests/test_golden_vectors.py (self-generated drift detectors), every
expected value in this file comes from OUTSIDE this repository:

* Poseidon permutation KATs: the published plonky2 test vectors
  (plonky2 src/hash/poseidon.rs `test_vectors`, upstream of the reference's
  fork -- prover/Cargo.toml:17-20 pins plonky2 branch zkm_dev; the
  reference's constants in prover/src/poseidon/constants.rs are the same
  Goldilocks width-12 instance).  Inputs: all zeros, 0..12, all NEG_ONE;
  expected outputs were "calculated with (modified) hadeshash reference
  implementation" per the plonky2 test comment.
* Real Ethereum block data: the reference's minigeth preimage oracle corpus
  (emulator/test-vectors/0_13284491, block 13284491) -- preimage files are
  keyed by the keccak256 of their contents, which externally validates our
  keccak; and the oracle-load syscall (4020) is exercised end-to-end against
  a real preimage, mirroring emulator/src/tests.rs test_execute_minigeth
  (the minigeth ELF itself is not shipped in the reference tree, so the
  segment boundary is driven by an assembled guest instead).
"""

import os

import pytest

from zkm_tpu.hash import poseidon
from zkm_tpu.hash.keccak import keccak256

P = 0xFFFFFFFF00000001
BLOCK_DIR = "/root/reference/emulator/test-vectors/0_13284491/"

# plonky2 src/hash/poseidon.rs `test_vectors` (width 12, Goldilocks).
PLONKY2_POSEIDON_KATS = [
    (
        [0] * 12,
        [0x3C18A9786CB0B359, 0xC4055E3364A246C3, 0x7953DB0AB48808F4,
         0xC71603F33A1144CA, 0xD7709673896996DC, 0x46A84E87642F44ED,
         0xD032648251EE0B3C, 0x1C687363B207DF62, 0xDF8565563E8045FE,
         0x40F5B37FF4254DAE, 0xD070F637B431067C, 0x1792B1C4342109D7],
    ),
    (
        list(range(12)),
        [0xD64E1E3EFC5B8E9E, 0x53666633020AAA47, 0xD40285597C6A8825,
         0x613A4F81E81231D2, 0x414754BFEBD051F0, 0xCB1F8980294A023F,
         0x6EB2A9E4D54A9D0F, 0x1902BC3AF467E056, 0xF045D5EAFDC6021F,
         0xE4150F77CAAA3BE5, 0xC9BFD01D39B50CCE, 0x5C0A27FCB0E1459B],
    ),
    (
        [P - 1] * 12,
        [0xBE0085CFC57A8357, 0xD95AF71847D05C09, 0xCF55A13D33C1C953,
         0x95803A74F4530E82, 0xFCD99EB30A135DF1, 0xE095905E913A3029,
         0xDE0392461B42919B, 0x7D3260E24E81D031, 0x10D3D0465D9DEAA0,
         0xA87571083DFC2A47, 0xE18263681E9958F8, 0xE28E96F1AE5E60D3],
    ),
]


@pytest.mark.parametrize("inp,expected", PLONKY2_POSEIDON_KATS,
                         ids=["zeros", "range", "neg_one"])
def test_poseidon_matches_plonky2_published_vectors(inp, expected):
    out = poseidon.permute_host(list(inp))
    assert [int(x) for x in out] == expected


def _preimage_files():
    if not os.path.isdir(BLOCK_DIR):
        return []
    return sorted(f for f in os.listdir(BLOCK_DIR) if f.startswith("0x"))


@pytest.mark.skipif(not _preimage_files(),
                    reason="reference minigeth block data not present")
def test_minigeth_preimages_are_keccak256_keyed():
    files = _preimage_files()
    assert len(files) == 11
    for fn in files:
        with open(BLOCK_DIR + fn, "rb") as f:
            data = f.read()
        assert "0x" + keccak256(data).hex() == fn, fn


@pytest.mark.skipif(not _preimage_files(),
                    reason="reference minigeth block data not present")
def test_preimage_oracle_loads_real_block_data():
    """Guest writes a real preimage hash at 0x30001000 and issues syscall
    4020 (reference emulator/src/state.rs:468-512 load_preimage); the
    oracle must map the preimage into memory at 0x31000000 with the
    reference's length prefix and pad10*1 final-word patch."""
    from zkm_tpu.emulator.state import InstrumentedState, State
    from zkm_tpu.runtime.asm import Asm
    from zkm_tpu.runtime import guest

    fn = _preimage_files()[0]
    with open(BLOCK_DIR + fn, "rb") as f:
        data = f.read()
    hash_words = [int.from_bytes(bytes.fromhex(fn[2:])[i:i + 4], "big")
                  for i in range(0, 32, 4)]

    a = Asm()
    a.li("t1", 0x30001000)
    for i, w in enumerate(hash_words):
        a.li("t0", w)
        a.sw("t0", 4 * i, "t1")
    a.li("v0", 4020)
    a.syscall()
    # read back the length the oracle wrote (exercises the loaded page)
    a.li("t1", 0x31000000)
    a.lw("t2", 0, "t1")
    guest.halt(a, 0)

    state = State()
    state.memory.set_memory_range(0, a.assemble())
    inst = InstrumentedState(state, BLOCK_DIR)
    for _ in range(10_000):
        if state.exited:
            break
        inst.step()
    assert state.exited and state.exit_code == 0

    assert state.memory.get_memory(0x31000000) == len(data)
    # full preimage contents (minus the padded tail word)
    n_whole = len(data) // 4
    for i in range(n_whole):
        got = state.memory.get_memory(0x31000004 + 4 * i)
        assert got == int.from_bytes(data[4 * i:4 * i + 4], "big"), i
    rem = len(data) & 3
    if rem:
        tail = state.memory.get_memory(0x31000004 + 4 * n_whole)
        tail_bytes = tail.to_bytes(4, "big")
        assert tail_bytes[:rem] == data[4 * n_whole:]
        assert tail_bytes[rem] & 0x01 or tail_bytes[rem] == 1
