"""Host-facing proving API.

Reference analog: prover/examples/utils/src/utils.rs `prove_segments` and
the env-var CLI drivers (split-seg, prove-seg) — SURVEY.md layer 7.

Round-1 pipeline: ELF -> execute+split into Segments -> per-segment witness
extraction -> multi-table STARK proof (implemented-table subset with
self-CTLs; the full 12-table CTL topology replaces this as tables land) ->
native verification.  Receipt chaining checks pre/post image ids across
segments (the continuation protocol's public-value link).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional

from .emulator.state import InstrumentedState, Segment, State
from .emulator.utils import load_elf_with_patch, split_prog_into_segs
from .stark.all_stark import AllStark, make_all_stark
from .stark.config import StarkConfig
from .stark.proof import AllProof, MemRoots, PublicValues
from .stark.prover import prove_with_traces
from .stark.verifier import verify_proof
from .tables import arithmetic as arith
from .tables import logic
from .tables import memory as mem
from .witness.extract import extract_witness


@dataclass
class SegmentReceipt:
    """Proof + public values for one segment (reference Receipt::Segments)."""
    proof: AllProof
    pre_image_id: bytes
    image_id: bytes
    userdata: bytes


def public_values_for_segment(seg: Segment) -> PublicValues:
    userdata = hashlib.sha256(
        seg.input_stream[0] if seg.input_stream else b"").digest()
    return PublicValues(
        roots_before=MemRoots.from_image_id(seg.pre_image_id),
        roots_after=MemRoots.from_image_id(seg.image_id),
        userdata=userdata)


def prove_segment(seg: Segment, config: Optional[StarkConfig] = None,
                  all_stark: Optional[AllStark] = None,
                  debug: bool = False) -> SegmentReceipt:
    """Re-execute a segment and prove the implemented tables over it."""
    config = config or StarkConfig.standard_fast_config()
    all_stark = all_stark or make_all_stark()

    state, steps = State.load_seg(seg)
    ist = InstrumentedState(state, "")
    log = extract_witness(ist, max_steps=steps)
    if log.num_steps != steps:
        raise RuntimeError(
            f"segment replay mismatch: {log.num_steps} != {steps}")

    from .stark.all_stark import Table
    traces = []
    for t in all_stark.tables:
        if t == Table.Arithmetic:
            traces.append(arith.generate_trace(log.arith_ops))
        elif t == Table.Logic:
            traces.append(logic.generate_trace(log.logic_ops))
        elif t == Table.Memory:
            traces.append(mem.generate_trace(log.memory_ops))
        else:
            raise NotImplementedError(f"table {t}")

    pv = public_values_for_segment(seg)
    proof = prove_with_traces(all_stark.starks, config, traces,
                              all_stark.ctls, pv, debug=debug)
    return SegmentReceipt(proof=proof, pre_image_id=seg.pre_image_id,
                          image_id=seg.image_id, userdata=pv.userdata)


def verify_segment_receipt(receipt: SegmentReceipt,
                           config: Optional[StarkConfig] = None,
                           all_stark: Optional[AllStark] = None):
    config = config or StarkConfig.standard_fast_config()
    all_stark = all_stark or make_all_stark()
    verify_proof(all_stark.starks, receipt.proof, all_stark.ctls, config)


def check_receipt_chain(receipts: List[SegmentReceipt]):
    """Continuation check: each segment's post-state is the next's pre-state
    (the aggregation circuit's roots_after == roots_before link)."""
    for a, b in zip(receipts, receipts[1:]):
        if a.image_id != b.pre_image_id:
            raise ValueError("segment receipts do not chain")
        if a.userdata != b.userdata:
            raise ValueError("userdata mismatch across segments")


def prove_elf(elf_path: str, args: List[str] = (),
              inputs: List[bytes] = (), seg_size: int = 65536,
              config: Optional[StarkConfig] = None,
              max_steps: Optional[int] = None,
              debug: bool = False) -> List[SegmentReceipt]:
    """Full pipeline: load ELF, execute+split, prove every segment."""
    state = load_elf_with_patch(elf_path, list(args))
    for raw in inputs:
        state.add_input_stream_bytes(raw)
    _, segments, _ = split_prog_into_segs(state, None, "", seg_size,
                                          max_steps=max_steps)
    receipts = [prove_segment(s, config, debug=debug) for s in segments]
    check_receipt_chain(receipts)
    return receipts
