"""ctypes bindings for the native C++ MIPS interpreter core.

The core (native/mips_core.cpp) executes the hot interpreter loop ~100x
faster than the Python fallback; Python keeps handling syscalls (the core
returns at every `syscall` instruction) and the Poseidon page hashing runs
through the batched device kernels either way.

Build on demand with g++ (no external deps); falls back gracefully when no
toolchain is available — `load_core()` returns None and callers keep using
the pure-Python emulator.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..hash import poseidon as ps
from .memory import (_CONST_HASH_PAGES, HASH_ADDRESS_BASE, HASH_LEVEL,
                     PAGE_ADDR_MASK, PAGE_ADDR_SIZE, PAGE_SIZE,
                     REGISTERS_OFFSET, ROOT_PAGE_INDEX, hash_page_bytes)

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_HERE, "native", "mips_core.cpp")
_LIB = os.path.join(_HERE, "native", "libmips_core.so")

_core_lib = None


class CoreRegs(ctypes.Structure):
    _fields_ = [("regs", ctypes.c_uint32 * 32),
                ("pc", ctypes.c_uint32), ("next_pc", ctypes.c_uint32),
                ("hi", ctypes.c_uint32), ("lo", ctypes.c_uint32),
                ("heap", ctypes.c_uint32), ("brk_", ctypes.c_uint32),
                ("local_user", ctypes.c_uint32),
                ("step", ctypes.c_uint64), ("cycle", ctypes.c_uint64)]


STOP_STEPS, STOP_SYSCALL, STOP_FAULT = 0, 1, 2


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_core():
    """Load (building if needed) the native core; None if unavailable."""
    global _core_lib
    if _core_lib is not None:
        return _core_lib
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    lib = ctypes.CDLL(_LIB)
    lib.core_new.restype = ctypes.c_void_p
    lib.core_new.argtypes = [ctypes.c_char_p]
    lib.core_free.argtypes = [ctypes.c_void_p]
    lib.core_get_regs.argtypes = [ctypes.c_void_p, ctypes.POINTER(CoreRegs)]
    lib.core_set_regs.argtypes = [ctypes.c_void_p, ctypes.POINTER(CoreRegs)]
    lib.core_get_memory.restype = ctypes.c_uint32
    lib.core_get_memory.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.core_set_memory.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                    ctypes.c_uint32]
    lib.core_write_block.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                     ctypes.c_char_p, ctypes.c_uint32]
    lib.core_init_memory.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                     ctypes.c_uint32]
    lib.core_run.restype = ctypes.c_int
    lib.core_run.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                             ctypes.POINTER(ctypes.c_uint64)]
    lib.core_page_count.restype = ctypes.c_uint64
    lib.core_page_count.argtypes = [ctypes.c_void_p]
    lib.core_rtrace_dump.restype = ctypes.c_uint64
    lib.core_rtrace_dump.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_uint32),
                                     ctypes.c_char_p, ctypes.c_uint64]
    lib.core_rtrace_clear.argtypes = [ctypes.c_void_p]
    lib.core_wtrace_count.restype = ctypes.c_uint64
    lib.core_wtrace_count.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.core_wtrace_dump.restype = ctypes.c_uint64
    lib.core_wtrace_dump.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_uint32),
                                     ctypes.c_uint64]
    lib.core_wtrace_clear.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.core_wtrace_add.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_uint32]
    lib.core_read_page.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                   ctypes.c_char_p]
    lib.core_write_raw.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                   ctypes.c_char_p, ctypes.c_uint32]
    _core_lib = lib
    return lib


class CoreMemory:
    """Memory API backed by the native core (mirrors emulator.memory.Memory)."""

    def __init__(self):
        lib = load_core()
        assert lib is not None, "native core unavailable"
        self._lib = lib
        const_pages = b"".join(_CONST_HASH_PAGES.get(l)
                               for l in range(HASH_LEVEL))
        self._h = ctypes.c_void_p(lib.core_new(const_pages))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.core_free(self._h)
            self._h = None

    def get_memory(self, addr: int) -> int:
        if addr & 3:
            raise ValueError(f"unaligned memory access: {addr:x}")
        return int(self._lib.core_get_memory(self._h, addr))

    def byte(self, addr: int) -> int:
        word = self.get_memory(addr & 0xFFFFFFFC)
        return (word >> (24 - (addr & 3) * 8)) & 0xFF

    def set_memory(self, addr: int, v: int):
        if addr & 3:
            raise ValueError(f"unaligned memory access: {addr:x}")
        self._lib.core_set_memory(self._h, addr, v & 0xFFFFFFFF)

    def set_memory_range(self, addr: int, data: bytes):
        self._lib.core_write_block(self._h, addr, bytes(data), len(data))

    def init_memory(self, addr: int, v: int):
        self._lib.core_init_memory(self._h, addr, v & 0xFFFFFFFF)

    def page_count(self) -> int:
        return int(self._lib.core_page_count(self._h))

    def _read_page(self, page_index: int) -> bytes:
        buf = ctypes.create_string_buffer(PAGE_SIZE)
        self._lib.core_read_page(self._h, page_index, buf)
        return buf.raw

    def update_page_hash(self):
        for level in range(HASH_LEVEL):
            count = int(self._lib.core_wtrace_count(self._h, level))
            if not count:
                continue
            idx = (ctypes.c_uint32 * count)()
            got = int(self._lib.core_wtrace_dump(self._h, level, idx, count))
            self._lib.core_wtrace_clear(self._h, level)
            dirty = sorted(idx[i] for i in range(got))
            datas = np.stack([
                np.frombuffer(self._read_page(pi), dtype="<u4")
                for pi in dirty])
            digests = ps.hash_pages(datas)
            for pi, dig in zip(dirty, digests):
                raw = b"".join(int(x).to_bytes(8, "little") for x in dig)
                hash_addr = ((pi << 5) + HASH_ADDRESS_BASE) & 0xFFFFFFFF
                self._lib.core_write_raw(self._h, hash_addr, raw, 32)
                if level < 2:
                    self._lib.core_wtrace_add(
                        self._h, level + 1, hash_addr >> PAGE_ADDR_SIZE)

    def compute_image_id(self, pc: int, registers_bytes: bytes):
        root_addr = (ROOT_PAGE_INDEX << PAGE_ADDR_SIZE) + REGISTERS_OFFSET
        self._lib.core_write_raw(self._h, root_addr, registers_bytes,
                                 len(registers_bytes))
        hash_root = hash_page_bytes(self._read_page(ROOT_PAGE_INDEX))
        swapped = b"".join(hash_root[i:i + 4][::-1] for i in range(0, 32, 4))
        final = swapped + (pc & 0xFFFFFFFF).to_bytes(4, "little")
        digest = ps.poseidon_bytes(final)
        image_id = b"".join(int(x).to_bytes(8, "little") for x in digest)
        return image_id, hash_root

    def get_input_image(self) -> Dict[int, int]:
        count = max(1, int(self._lib.core_page_count(self._h)))
        idx = (ctypes.c_uint32 * count)()
        snaps = ctypes.create_string_buffer(count * PAGE_SIZE)
        got = int(self._lib.core_rtrace_dump(self._h, idx, snaps, count))
        self._lib.core_rtrace_clear(self._h)
        image = {}
        for i in range(got):
            base = idx[i] << PAGE_ADDR_SIZE
            words = np.frombuffer(
                snaps.raw[i * PAGE_SIZE:(i + 1) * PAGE_SIZE], dtype="<u4")
            for j, w in enumerate(words):
                image[base + (j << 2)] = int(w)
        return image

    # -- register sync with the core ----------------------------------------

    def push_regs(self, state):
        r = CoreRegs()
        for i in range(32):
            r.regs[i] = state.registers[i]
        r.pc, r.next_pc = state.pc, state.next_pc
        r.hi, r.lo = state.hi, state.lo
        r.heap, r.brk_ = state.heap, state.brk
        r.local_user = state.local_user
        r.step, r.cycle = state.step, state.cycle
        self._lib.core_set_regs(self._h, ctypes.byref(r))

    def pull_regs(self, state):
        r = CoreRegs()
        self._lib.core_get_regs(self._h, ctypes.byref(r))
        state.registers = [int(r.regs[i]) for i in range(32)]
        state.pc, state.next_pc = int(r.pc), int(r.next_pc)
        state.hi, state.lo = int(r.hi), int(r.lo)
        state.heap, state.brk = int(r.heap), int(r.brk_)
        state.local_user = int(r.local_user)
        state.step, state.cycle = int(r.step), int(r.cycle)

    def run(self, state, max_steps: int) -> Tuple[int, int]:
        """Run up to max_steps in the core; returns (reason, steps_done)."""
        self.push_regs(state)
        done = ctypes.c_uint64()
        reason = int(self._lib.core_run(self._h, max_steps,
                                        ctypes.byref(done)))
        self.pull_regs(state)
        return reason, int(done.value)
