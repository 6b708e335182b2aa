//go:build mips
// +build mips

// MIPS syscall stubs for the Go guest SDK.  Syscall numbers match the
// emulator ABI (zkm_tpu/emulator/state.py handle_syscall; reference
// emulator/src/state.rs:598-918).  Go MIPS ABI: args at FP offsets,
// syscall number in R2, args in R4/R5/R6, result in R2.

TEXT ·SyscallWrite(SB), $0-24
	MOVW	$4004, R2	// SYS_write
	MOVW	fd+0(FP), R4
	MOVW	buf+4(FP), R5	// slice data pointer
	MOVW	nbytes+16(FP), R6
	SYSCALL
	MOVW	R2, ret+20(FP)
	RET

TEXT ·SyscallHintLen(SB), $0-4
	MOVW	$0xF0, R2	// SYS_hint_len
	SYSCALL
	MOVW	R2, ret+0(FP)
	RET

TEXT ·SyscallHintRead(SB), $0-16
	MOVW	$0xF1, R2	// SYS_hint_read
	MOVW	buf+0(FP), R4	// slice data pointer
	MOVW	n+12(FP), R5
	SYSCALL
	RET
