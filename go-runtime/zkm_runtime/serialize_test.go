package zkm_runtime

// Wire-format contract vectors.  The SAME vectors are asserted by
// tests/test_go_runtime_contract.py against the host-side Python
// serializer (zkm_tpu/utils/serialize.py) — if either side drifts from
// legacy bincode 1.x, one of the two suites fails.  (This image has no
// Go toolchain; run `go test ./...` wherever one exists.)

import (
	"bytes"
	"testing"
)

type testStruct struct {
	A uint32
	B []byte
	C string
	D bool
}

var contractVectors = []struct {
	name string
	val  any
	want []byte
}{
	{"u32", uint32(0xDEADBEEF), []byte{0xEF, 0xBE, 0xAD, 0xDE}},
	{"i64_neg", int64(-2), []byte{0xFE, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF,
		0xFF, 0xFF}},
	{"bool_true", true, []byte{1}},
	{"bytes", []byte{1, 2, 3}, []byte{3, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3}},
	{"string_ab", "ab", []byte{2, 0, 0, 0, 0, 0, 0, 0, 'a', 'b'}},
	{"vec_u16", []uint16{0x0102, 0x0304}, []byte{2, 0, 0, 0, 0, 0, 0, 0,
		0x02, 0x01, 0x04, 0x03}},
	{"array4", [4]byte{9, 8, 7, 6}, []byte{9, 8, 7, 6}},
	{"opt_none", (*uint32)(nil), []byte{0}},
	{"struct", testStruct{A: 5, B: []byte{0xAA}, C: "x", D: true},
		[]byte{5, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0xAA,
			1, 0, 0, 0, 0, 0, 0, 0, 'x', 1}},
}

func TestSerializeVectors(t *testing.T) {
	for _, tc := range contractVectors {
		got := MustSerialize(tc.val)
		if !bytes.Equal(got, tc.want) {
			t.Errorf("%s: got %x want %x", tc.name, got, tc.want)
		}
	}
}

func TestRoundTrip(t *testing.T) {
	in := testStruct{A: 42, B: []byte{1, 2, 3, 4}, C: "hello", D: false}
	var out testStruct
	Deserialize(MustSerialize(in), &out)
	if out.A != in.A || !bytes.Equal(out.B, in.B) ||
		out.C != in.C || out.D != in.D {
		t.Errorf("round trip mismatch: %+v != %+v", out, in)
	}
}
