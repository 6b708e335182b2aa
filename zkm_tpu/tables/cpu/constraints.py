"""CPU constraint groups (placeholder shells filled in this round).

Each eval_* mirrors the same-named reference module under
/root/reference/prover/src/cpu/.
"""

from __future__ import annotations

from . import columns as cc


def eval_bootstrap(a, lv, nv, consumer):
    pass


def eval_decode(a, lv, consumer):
    pass


def eval_flag_opcode_binding(a, lv, consumer):
    pass


def eval_pc_chain(a, lv, nv, consumer):
    pass


def eval_jumps(a, lv, nv, consumer):
    pass


def eval_branch(a, lv, nv, consumer):
    pass


def eval_membus(a, lv, consumer):
    pass


def eval_memio(a, lv, consumer):
    pass


def eval_shift(a, lv, consumer):
    pass


def eval_count(a, lv, consumer):
    pass


def eval_syscall(a, lv, consumer):
    pass


def eval_bits(a, lv, consumer):
    pass


def eval_misc(a, lv, consumer):
    pass
