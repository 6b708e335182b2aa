//go:build mips
// +build mips

// Package zkm_runtime is the guest-side SDK for Go programs running in
// the zkm-tpu MIPS zkVM.
//
// API parity target: reference go-runtime/zkm_runtime/runtime.go:6-30
// (Read[T]/Commit[T] over the hint/commit syscalls).  The wire format is
// legacy bincode 1.x (little-endian, fixed-width ints, u64 length
// prefixes) — the same format zkm_tpu/utils/serialize.py speaks on the
// host side; tests/test_go_runtime_contract.py and serialize_test.go pin
// the byte vectors from both sides.
//
// Syscall ABI (zkm_tpu/emulator/state.py handle_syscall):
//
//	0x000000F0  hint length  -> v0 = byte length of the next input item
//	0x000000F1  hint read    -> copy input item to (a0, a1) 4-aligned buf
//	4004        write        -> fd 3 commits public values
package zkm_runtime

// Implemented in syscall_mips.s.
func SyscallWrite(fd int, buf []byte, nbytes int) int
func SyscallHintLen() int
func SyscallHintRead(buf []byte, n int)

// Read deserializes the next host-provided input item into a T.
// The emulator writes input bytes in whole 4-byte words, so the scratch
// buffer is rounded up to a word boundary before the raw length is
// sliced back off (state.py syscall 0xF1 semantics).
func Read[T any]() T {
	n := SyscallHintLen()
	buf := make([]byte, (n+3)&^3)
	SyscallHintRead(buf, n)
	var out T
	Deserialize(buf[:n], &out)
	return out
}

// Commit serializes value and appends it to the public-values stream
// (fd 3).  The written byte count is the unpadded serialized length; the
// buffer itself is padded to a word boundary for the word-granular
// syscall, matching the Rust runtime's io::commit.
func Commit[T any](value T) {
	b := MustSerialize(value)
	n := len(b)
	if pad := (4 - n&3) & 3; pad != 0 {
		b = append(b, make([]byte, pad)...)
	}
	SyscallWrite(3, b, n)
}
