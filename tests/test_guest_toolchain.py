"""Guest toolchain layer: bincode wire format + build wrapper
(docs/guest_toolchain.md; reference build/src/lib.rs, emulator
state.rs:448-459, go-runtime serialize.go)."""

import pytest

from zkm_tpu.utils.serialize import (U8, U16, U64, bincode_deserialize,
                                     bincode_serialize)


def test_bincode_roundtrip_scalars():
    data = bincode_serialize((U8(7), U16(258), 0xDEADBEEF, U64(2**40),
                              True, False))
    spec = ("u8", "u16", "u32", "u64", "bool", "bool")
    val, off = bincode_deserialize(data, spec)
    assert val == (7, 258, 0xDEADBEEF, 2**40, True, False)
    assert off == len(data)


def test_bincode_roundtrip_containers():
    data = bincode_serialize((b"\x01\x02\x03", "hi", [1, 2, 3]))
    val, off = bincode_deserialize(data, ("bytes", "str", ("vec", "u32")))
    assert val == (b"\x01\x02\x03", "hi", [1, 2, 3])
    assert off == len(data)


def test_bincode_matches_reference_layout():
    """bincode 1.x legacy config: u64 LE length prefixes, fixed-width LE
    ints (what the reference's serialize_into emits for Vec<u8> and what
    the Go serializer mirrors)."""
    assert bincode_serialize(b"ab") == \
        (2).to_bytes(8, "little") + b"ab"
    assert bincode_serialize("A") == (1).to_bytes(8, "little") + b"A"
    assert bincode_serialize([U8(5)]) == (1).to_bytes(8, "little") + b"\x05"


def test_build_wrapper_raises_actionable_error_without_toolchain():
    from zkm_tpu.runtime.build import (BuildArgs, BuildToolchainError,
                                       build_program, find_cargo)
    if find_cargo() is not None:
        pytest.skip("cargo present; error path not reachable")
    with pytest.raises(BuildToolchainError, match="mips-zkm-zkvm-elf"):
        build_program(BuildArgs(path="/tmp/nonexistent-guest"))


def test_guest_reads_typed_input_and_commits():
    """Round trip through the zkVM ABI: host serializes a typed input
    (bincode), the assembled guest hint-reads it, and the host reads back
    committed public values typed — State.read_public_values semantics."""
    from zkm_tpu.emulator.state import InstrumentedState, State
    from zkm_tpu.runtime.asm import Asm
    from zkm_tpu.runtime import guest

    payload = bincode_serialize((0xAABBCCDD,))   # one u32 struct field
    a = Asm()
    guest.hint_len(a)
    a.move("a1", "v0")
    a.li("a0", 0x2000)
    guest.hint_read(a)
    guest.commit(a, 0x2000, 4)
    guest.halt(a, 0)

    state = State()
    state.memory.set_memory_range(0, a.assemble())
    state.add_input_stream_bytes(payload)
    inst = InstrumentedState(state, "")
    for _ in range(10_000):
        if state.exited:
            break
        inst.step()
    assert state.exited and state.exit_code == 0
    committed = bytes(state.public_values_stream)
    val, _ = bincode_deserialize(committed, "u32")
    assert val == 0xAABBCCDD
