"""Native C++ interpreter core: parity with the Python emulator."""

import glob
import os

import pytest

from zkm_tpu.emulator.native import load_core
from zkm_tpu.emulator.state import InstrumentedState, State
from zkm_tpu.emulator.utils import load_elf_with_patch

REF_TESTS = "/root/reference/emulator/src/open_mips_tests/test/bin"
END_ADDR = 0xA7EF00D0

requires_core = pytest.mark.skipif(load_core() is None,
                                   reason="native core unavailable")
requires_ref = pytest.mark.skipif(not os.path.isdir(REF_TESTS),
                                  reason="reference fixtures not available")


@requires_core
@requires_ref
def test_native_open_mips_conformance():
    failures = []
    for path in sorted(glob.glob(os.path.join(REF_TESTS, "*.bin"))):
        name = os.path.basename(path)
        if name == "oracle.bin":
            continue
        with open(path, "rb") as f:
            data = f.read()
        state = State(native=True)
        state.memory.set_memory_range(0, data)
        state.registers[31] = END_ADDR
        ist = InstrumentedState(state, "")
        for _ in range(1000):
            if ist.state.pc == END_ADDR:
                break
            ist.run_fast(1)
        done = ist.state.memory.get_memory(0xBFFFFFF4)
        result = ist.state.memory.get_memory(0xBFFFFFF8)
        if ist.state.pc != END_ADDR or done != 1 or result != 1:
            failures.append((name, hex(ist.state.pc), done, result))
    assert not failures, f"native ISA conformance failures: {failures}"


@requires_core
def test_native_segmentation_chains():
    """Native-core segmentation of the hello ELF: receipts must chain and
    reach the same final image id as the Python path (split boundaries are
    a prover choice and may differ)."""
    elf = "/root/reference/emulator/test-vectors/hello"
    if not os.path.exists(elf):
        pytest.skip("hello ELF not available")
    from zkm_tpu.emulator.utils import load_elf_with_patch, \
        split_prog_into_segs
    finals = []
    for native in (False, True):
        state = load_elf_with_patch(elf, ["x"], native=native)
        total, segs, _ = split_prog_into_segs(state, None, "",
                                              seg_size=1 << 17)
        for a, b in zip(segs, segs[1:]):
            assert a.image_id == b.pre_image_id
        finals.append((total, segs[-1].image_id))
    assert finals[0] == finals[1]


@requires_core
def test_native_matches_python_on_hello():
    """Run the Go hello ELF on both backends; final state must agree."""
    elf = "/root/reference/emulator/test-vectors/hello"
    if not os.path.exists(elf):
        pytest.skip("hello ELF not available")

    results = []
    for native in (False, True):
        state = load_elf_with_patch(elf, ["aab"])
        if native:
            # rebuild with native memory, then re-load program state
            nstate = State(native=True)
            for page_index, data in state.memory.pages.items():
                nstate.memory._lib.core_write_raw(
                    nstate.memory._h, page_index << 12, bytes(data), 4096)
            nstate.registers = list(state.registers)
            nstate.pc, nstate.next_pc = state.pc, state.next_pc
            nstate.brk, nstate.heap = state.brk, state.heap
            state = nstate
        ist = InstrumentedState(state, "")
        steps = 0
        while not ist.state.exited and steps < 2_000_000:
            steps += ist.run_fast(10_000)
        results.append((steps, ist.state.exited, ist.state.exit_code,
                        tuple(ist.state.registers),
                        bytes(ist.stdout_buf)))
    py, nat = results
    assert py[1] and nat[1], "did not exit"
    assert py[0] == nat[0], f"step mismatch {py[0]} vs {nat[0]}"
    assert py[2] == nat[2]
    assert py[3] == nat[3], "register file mismatch"
    assert py[4] == nat[4], "stdout mismatch"
