package zkm_runtime

// Legacy-bincode-1.x serializer (little-endian, fixed-width integers,
// u64 length prefixes).  Fresh implementation of the format the
// reference SDK speaks (go-runtime/zkm_runtime/serialize.go) — the byte
// vectors in serialize_test.go / tests/test_go_runtime_contract.py are
// the normative contract.
//
// Supported shapes: bool, int8..int64, uint8..uint64, string, []uint8,
// []T (u64 count prefix), [N]uint8 (raw, no prefix), *T (option tag
// byte), struct (fields in declaration order, no prefix).

import (
	"encoding/binary"
	"fmt"
	"reflect"
)

func MustSerialize(v any) []byte {
	b, err := Serialize(v)
	if err != nil {
		panic(err)
	}
	return b
}

func Serialize(v any) ([]byte, error) {
	var out []byte
	err := appendValue(&out, reflect.ValueOf(v))
	return out, err
}

func appendValue(out *[]byte, v reflect.Value) error {
	switch v.Kind() {
	case reflect.Bool:
		t := byte(0)
		if v.Bool() {
			t = 1
		}
		*out = append(*out, t)
	case reflect.Int8, reflect.Uint8:
		*out = append(*out, byte(scalarBits(v)))
	case reflect.Int16, reflect.Uint16:
		*out = binary.LittleEndian.AppendUint16(*out, uint16(scalarBits(v)))
	case reflect.Int32, reflect.Uint32:
		*out = binary.LittleEndian.AppendUint32(*out, uint32(scalarBits(v)))
	case reflect.Int64, reflect.Uint64:
		*out = binary.LittleEndian.AppendUint64(*out, scalarBits(v))
	case reflect.String:
		*out = binary.LittleEndian.AppendUint64(*out, uint64(v.Len()))
		*out = append(*out, v.String()...)
	case reflect.Slice:
		*out = binary.LittleEndian.AppendUint64(*out, uint64(v.Len()))
		for i := 0; i < v.Len(); i++ {
			if err := appendValue(out, v.Index(i)); err != nil {
				return err
			}
		}
	case reflect.Array:
		// fixed-size arrays carry no length prefix in bincode
		for i := 0; i < v.Len(); i++ {
			if err := appendValue(out, v.Index(i)); err != nil {
				return err
			}
		}
	case reflect.Ptr:
		if v.IsNil() {
			*out = append(*out, 0)
			return nil
		}
		*out = append(*out, 1)
		return appendValue(out, v.Elem())
	case reflect.Struct:
		for i := 0; i < v.NumField(); i++ {
			if err := appendValue(out, v.Field(i)); err != nil {
				return err
			}
		}
	default:
		return fmt.Errorf("zkm_runtime: cannot serialize %v", v.Kind())
	}
	return nil
}

func scalarBits(v reflect.Value) uint64 {
	switch v.Kind() {
	case reflect.Int8, reflect.Int16, reflect.Int32, reflect.Int64:
		return uint64(v.Int())
	default:
		return v.Uint()
	}
}
