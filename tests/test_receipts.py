"""Receipt/assumption composition model + segment re-split.

Reference: generation/state.rs:23-206 (receipts), operation.rs verify
(:991-1022), emulator/src/utils.rs:62-104 (split_seg_into_segs),
prover/examples/sha2-composition (driver pattern).
"""

import numpy as np
import pytest

from zkm_tpu import receipts as rc
from zkm_tpu.emulator.state import State
from zkm_tpu.emulator.utils import split_prog_into_segs, split_seg_into_segs
from zkm_tpu.witness.generation import generate_segment_traces

# sys_verify(claim @ 0x1000, 32), then exit_group(0).  The lw pulls the
# claim page into the segment image (a real guest writes the digest there
# itself; the emulator's sys_verify reads nothing, state.rs:906-909).
VERIFY_PROG = [
    0x8C091000,          # lw t1, 0x1000(zero)
    0x240200F2,          # v0 = SYS_VERIFY
    0x24051000,          # a1 = 0x1000 (claim addr)
    0x24060020,          # a2 = 32
    0x0000000C,          # syscall
    0x24021096, 0x24040000, 0x0000000C,
]


def _verify_segment(claim: bytes):
    prog = b"".join(w.to_bytes(4, "big") for w in VERIFY_PROG)
    state = State()
    state.memory.set_memory_range(0, prog)
    state.memory.set_memory_range(0x1000, claim)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    return segs[0]


def _claim(elf_id=b"\x11" * 32, commit=b"\x22" * 32):
    return rc.ReceiptClaim(elf_id=elf_id, commit=commit)


def test_claim_digest():
    import hashlib
    c = _claim()
    assert rc.claim_digest(c) == hashlib.sha256(
        c.elf_id + c.commit).digest()


def test_sys_verify_resolves_assumption():
    inner = rc.InnerReceipt(segments=[], claim=_claim())
    proven = rc.AssumptionReceipt(proven=rc.Receipt.segments(inner))
    digest = rc.claim_digest(inner.claim)
    seg = _verify_segment(digest)
    t = generate_segment_traces(seg, assumptions=[proven])
    assert t.claim_digests == [digest]
    assert len(t.assumptions_used) == 1
    assumption, used = t.assumptions_used[0]
    assert assumption.claim == digest
    assert used is proven


def test_sys_verify_unresolved_raises():
    seg = _verify_segment(b"\x99" * 32)
    with pytest.raises(KeyError):
        generate_segment_traces(seg, assumptions=[])


def test_verify_receipt_walks_closure(monkeypatch):
    verified = []
    monkeypatch.setattr(
        "zkm_tpu.host.verify_segment_receipt",
        lambda r, cfg=None, a=None: verified.append(r))

    class FakeSeg:
        def __init__(self, pre, post, userdata):
            self.pre_image_id = pre
            self.image_id = post
            self.userdata = userdata

    inner_a = rc.InnerReceipt(
        segments=[FakeSeg(b"\x11" * 32, b"\x33" * 32, b"\x22" * 32)],
        claim=_claim())
    receipt_a = rc.Receipt.segments(inner_a)

    assumption = rc.Assumption(claim=receipt_a.claim_digest())
    inner_b = rc.InnerReceipt(
        segments=[FakeSeg(b"\x44" * 32, b"\x55" * 32, b"\x66" * 32)],
        claim=rc.ReceiptClaim(elf_id=b"\x44" * 32, commit=b"\x66" * 32))
    composite = rc.Receipt.composite(rc.CompositeReceipt(
        program_receipt=inner_b,
        assumptions_used=[(assumption,
                           rc.AssumptionReceipt(proven=receipt_a))]))

    rc.verify_receipt(composite)
    assert len(verified) == 2          # program segment + assumption's

    # unresolved assumption: rejected unless explicitly allowed
    unresolved = rc.Receipt.composite(rc.CompositeReceipt(
        program_receipt=inner_b,
        assumptions_used=[(assumption,
                           rc.AssumptionReceipt(
                               unresolved=rc.Assumption(
                                   assumption.claim)))]))
    with pytest.raises(ValueError):
        rc.verify_receipt(unresolved)
    rc.verify_receipt(unresolved, allow_unresolved=True)

    # digest mismatch between assumption and its receipt
    bad = rc.Receipt.composite(rc.CompositeReceipt(
        program_receipt=inner_b,
        assumptions_used=[(rc.Assumption(b"\x00" * 32),
                           rc.AssumptionReceipt(proven=receipt_a))]))
    with pytest.raises(ValueError):
        rc.verify_receipt(bad)


def test_split_seg_into_segs_resplit():
    # a long-running loop: addiu t0 += 1 x N via a backwards branch
    prog_words = [
        0x24080000,              # addiu t0, zero, 0
        0x29090400,              # slti t1, t0, 1024
        0x1520FFFE,              # bnez t1, -2 insns (loop)
        0x21080001,              # addiu t0, t0, 1 (delay slot)
        0x24021096, 0x24040000, 0x0000000C,
    ]
    prog = b"".join(w.to_bytes(4, "big") for w in prog_words)
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    assert len(segs) == 1
    big = segs[0]

    total, subsegs, _ = split_seg_into_segs(big, None, "", seg_size=600)
    assert len(subsegs) > 1
    assert total == big.step
    assert subsegs[0].pre_image_id == big.pre_image_id
    assert subsegs[-1].image_id == big.image_id
    for x, y in zip(subsegs, subsegs[1:]):
        assert x.image_id == y.pre_image_id
    assert sum(s.step for s in subsegs) == big.step
