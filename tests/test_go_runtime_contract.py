"""Wire-format contract between the host serializer and the Go guest SDK.

The SAME byte vectors live in go-runtime/zkm_runtime/serialize_test.go;
both suites assert them independently, pinning the legacy-bincode-1.x
format from both sides of the guest I/O boundary (VERDICT r4 item 10).
Reference analog: go-runtime/zkm_runtime/serialize.go:11-114 /
runtime.go:10-30 and emulator/src/state.rs:448-452 (bincode host side).
"""

from zkm_tpu.utils.serialize import (I64, U16, U32, bincode_deserialize,
                                     bincode_serialize)

# (python value, expected bytes) — MUST match serialize_test.go
VECTORS = [
    (U32(0xDEADBEEF), bytes([0xEF, 0xBE, 0xAD, 0xDE])),
    (I64(-2), bytes([0xFE] + [0xFF] * 7)),
    (True, b"\x01"),
    (bytes([1, 2, 3]), bytes([3, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3])),
    ("ab", bytes([2, 0, 0, 0, 0, 0, 0, 0]) + b"ab"),
    ([U16(0x0102), U16(0x0304)],
     bytes([2, 0, 0, 0, 0, 0, 0, 0, 0x02, 0x01, 0x04, 0x03])),
    # Go struct{A uint32; B []byte; C string; D bool} == python tuple
    ((U32(5), bytes([0xAA]), "x", True),
     bytes([5, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0xAA,
            1, 0, 0, 0, 0, 0, 0, 0]) + b"x\x01"),
]


def test_contract_vectors():
    for value, want in VECTORS:
        assert bincode_serialize(value) == want, value


def test_struct_round_trip_via_spec():
    """Serialize with the guest-side layout, parse with the host-side
    schema reader (the host decodes committed public values this way)."""
    wire = bincode_serialize((U32(42), bytes([1, 2, 3, 4]), "hello", False))
    spec = ("u32", "bytes", "str", "bool")
    value, end = bincode_deserialize(wire, spec)
    assert end == len(wire)
    assert value == (42, bytes([1, 2, 3, 4]), "hello", False)


def test_go_read_alignment_rule():
    """Go Read[T] rounds the hint buffer to a 4-byte boundary and slices
    back to the raw length (runtime.go); the emulator's 0xF1 handler
    writes whole words.  Check the length arithmetic agrees for every
    residue class."""
    for n in range(1, 9):
        cap = (n + 3) & ~3
        assert cap % 4 == 0 and cap >= n and cap - n < 4
