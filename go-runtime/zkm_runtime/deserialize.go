package zkm_runtime

// Inverse of serialize.go (legacy bincode 1.x).  Deserialize consumes
// the whole buffer or panics — a trailing-byte mismatch means the guest
// and host disagree on T's shape, which must fail loudly inside the
// zkVM rather than silently truncate.

import (
	"encoding/binary"
	"fmt"
	"reflect"
)

func Deserialize(data []byte, target any) {
	v := reflect.ValueOf(target)
	if v.Kind() != reflect.Pointer || v.IsNil() {
		panic("zkm_runtime: Deserialize target must be a non-nil pointer")
	}
	rest, err := readValue(data, v.Elem())
	if err != nil {
		panic(err)
	}
	if len(rest) != 0 {
		panic(fmt.Sprintf("zkm_runtime: %d trailing bytes", len(rest)))
	}
}

func readValue(b []byte, v reflect.Value) ([]byte, error) {
	need := func(n int) error {
		if len(b) < n {
			return fmt.Errorf("zkm_runtime: short buffer (%d < %d)",
				len(b), n)
		}
		return nil
	}
	switch v.Kind() {
	case reflect.Bool:
		if err := need(1); err != nil {
			return nil, err
		}
		v.SetBool(b[0] == 1)
		return b[1:], nil
	case reflect.Int8:
		if err := need(1); err != nil {
			return nil, err
		}
		v.SetInt(int64(int8(b[0])))
		return b[1:], nil
	case reflect.Uint8:
		if err := need(1); err != nil {
			return nil, err
		}
		v.SetUint(uint64(b[0]))
		return b[1:], nil
	case reflect.Int16, reflect.Uint16:
		if err := need(2); err != nil {
			return nil, err
		}
		setScalar(v, uint64(binary.LittleEndian.Uint16(b)), 16)
		return b[2:], nil
	case reflect.Int32, reflect.Uint32:
		if err := need(4); err != nil {
			return nil, err
		}
		setScalar(v, uint64(binary.LittleEndian.Uint32(b)), 32)
		return b[4:], nil
	case reflect.Int64, reflect.Uint64:
		if err := need(8); err != nil {
			return nil, err
		}
		setScalar(v, binary.LittleEndian.Uint64(b), 64)
		return b[8:], nil
	case reflect.String:
		if err := need(8); err != nil {
			return nil, err
		}
		n := int(binary.LittleEndian.Uint64(b))
		if err := need(8 + n); err != nil {
			return nil, err
		}
		v.SetString(string(b[8 : 8+n]))
		return b[8+n:], nil
	case reflect.Slice:
		if err := need(8); err != nil {
			return nil, err
		}
		n := int(binary.LittleEndian.Uint64(b))
		b = b[8:]
		s := reflect.MakeSlice(v.Type(), n, n)
		var err error
		for i := 0; i < n; i++ {
			if b, err = readValue(b, s.Index(i)); err != nil {
				return nil, err
			}
		}
		v.Set(s)
		return b, nil
	case reflect.Array:
		var err error
		for i := 0; i < v.Len(); i++ {
			if b, err = readValue(b, v.Index(i)); err != nil {
				return nil, err
			}
		}
		return b, nil
	case reflect.Ptr:
		if err := need(1); err != nil {
			return nil, err
		}
		tag := b[0]
		b = b[1:]
		if tag == 0 {
			v.SetZero()
			return b, nil
		}
		v.Set(reflect.New(v.Type().Elem()))
		return readValue(b, v.Elem())
	case reflect.Struct:
		var err error
		for i := 0; i < v.NumField(); i++ {
			if b, err = readValue(b, v.Field(i)); err != nil {
				return nil, err
			}
		}
		return b, nil
	}
	return nil, fmt.Errorf("zkm_runtime: cannot deserialize %v", v.Kind())
}

func setScalar(v reflect.Value, bits uint64, width int) {
	switch v.Kind() {
	case reflect.Int16, reflect.Int32, reflect.Int64:
		// sign-extend from width
		shift := 64 - width
		v.SetInt(int64(bits<<shift) >> shift)
	default:
		v.SetUint(bits)
	}
}
