"""CPU STARK constraints.

Reference: /root/reference/prover/src/cpu/cpu_stark.rs:260-285 composes the
constraint groups; each group lives in its own method below (bootstrap,
decode, jumps/branches, membus, memio, shift, count, syscall, bits, misc).

Strengthened beyond the reference (see SOUNDNESS.md):
  * per-flag opcode/func binding — every op flag is tied to the decoded
    instruction bits (the reference's decode.rs leaves classification TODO);
  * pc chaining across consecutive cpu-cycle rows;
  * unused reference flags (eq_iszero, keccak_general, pc, get/set_context,
    exit_kernel op) are pinned to zero.
"""

from __future__ import annotations

from ...stark.stark import Stark
from . import columns as cc
from . import constraints as cons


class CpuStark(Stark):
    num_columns = cc.NUM_CPU_COLUMNS

    def eval_generic(self, a, lv, nv, consumer):
        cons.eval_bootstrap(a, lv, nv, consumer)
        cons.eval_decode(a, lv, consumer)
        cons.eval_flag_opcode_binding(a, lv, consumer)
        cons.eval_pc_chain(a, lv, nv, consumer)
        cons.eval_jumps(a, lv, nv, consumer)
        cons.eval_branch(a, lv, nv, consumer)
        cons.eval_membus(a, lv, consumer)
        cons.eval_memio(a, lv, consumer)
        cons.eval_shift(a, lv, consumer)
        cons.eval_count(a, lv, consumer)
        cons.eval_syscall(a, lv, consumer)
        cons.eval_bits(a, lv, consumer)
        cons.eval_misc(a, lv, consumer)
