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
import os
from dataclasses import dataclass
from typing import List, Optional

from .emulator.state import InstrumentedState, Segment, State
from .emulator.utils import load_elf_with_patch, split_prog_into_segs
from .field import goldilocks as gl
from .stark.all_stark import AllStark, Table, make_all_stark
from .stark.config import StarkConfig
from .stark.proof import AllProof, MemRoots, PublicValues
from .stark.prover import prove_with_traces
from .stark.verifier import verify_proof
from .tables import arithmetic as arith
from .tables import keccak as keccak_tab
from .tables import keccak_sponge as ksponge
from .tables import logic
from .tables import memory as mem
from .tables import poseidon
from .tables import poseidon_sponge as psponge
from .tables import sha_compress as shac
from .tables import sha_compress_sponge as shacs
from .tables import sha_extend as shae
from .tables import sha_extend_sponge as shaes
from .utils.timing import log, timed
from .witness.generation import generate_segment_traces


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


def height_floors_from_env() -> dict:
    """Per-table minimum trace heights ("degree buckets").

    Production proves a STREAM of segments whose natural per-table heights
    vary; every new height combination compiles a fresh set of XLA graphs
    (BENCH_r04: 1453 graphs, 53% of warm-up).  Padding each table up to a
    fixed floor makes all segments of a workload class share ONE compiled
    shape set.  The reference solves the same problem with per-table
    circuit degree ranges (recursion/src/lib.rs:32-45,
    DEFAULT_DEGREE_BITS_RANGE) and the same env-var override style.

    ZKM_HEIGHT_FLOORS="Cpu=16,Memory=17" (log2 heights).  Padding rows are
    each table's native padding (exit-kernel rows, filtered repeats,
    filter=0 permutations), so proofs stay valid at any floor.
    """
    spec = os.environ.get("ZKM_HEIGHT_FLOORS", "")
    floors = {}
    for part in spec.split(","):
        if "=" in part:
            name, bits = part.split("=")
            floors[Table[name.strip()]] = 1 << int(bits)
    return floors


def segment_traces(seg: Segment, all_stark: AllStark,
                   block_path: str = "", assumptions=(),
                   assumption_usage: Optional[list] = None,
                   height_floors: Optional[dict] = None) -> List:
    """Witness generation + per-table trace building for the subset.

    height_floors: {Table: min_rows} degree buckets (see
    height_floors_from_env); unlisted tables pad to their natural
    power-of-two height."""
    sponge = Table.PoseidonSponge in all_stark.tables
    keccak = Table.KeccakSponge in all_stark.tables
    sha = Table.ShaExtendSponge in all_stark.tables
    floors = dict(height_floors_from_env())
    floors.update(height_floors or {})

    def floor_of(tab, default=64):
        return max(floors.get(tab, 0), default)

    with timed("witness generation", steps=seg.step):
        t = generate_segment_traces(seg, block_path=block_path,
                                    sponge=sponge, keccak=keccak, sha=sha,
                                    assumptions=assumptions,
                                    min_rows=floor_of(Table.Cpu))
    if assumption_usage is not None:
        assumption_usage.extend(t.assumptions_used)
    builders = {
        Table.Arithmetic: lambda f: arith.generate_trace(
            t.arith_ops, min_rows=max(f, arith.RANGE_MIN_ROWS)),
        Table.Cpu: lambda f: gl.from_u64(t.cpu_rows.T.copy()),
        Table.Poseidon: lambda f: poseidon.generate_trace(
            t.poseidon_inputs, min_rows=f),
        Table.PoseidonSponge: lambda f: psponge.generate_trace(
            t.poseidon_sponge_ops, min_rows=max(f, psponge.MIN_ROWS)),
        Table.Keccak: lambda f: keccak_tab.generate_trace(
            t.keccak_inputs, min_rows=f),
        Table.KeccakSponge: lambda f: ksponge.generate_trace(
            t.keccak_sponge_ops, min_rows=max(f, ksponge.MIN_ROWS)),
        Table.ShaExtend: lambda f: shae.generate_trace(
            t.sha_extend_ops, min_rows=f),
        Table.ShaExtendSponge: lambda f: shaes.generate_trace(
            t.sha_extend_ops, min_rows=f),
        Table.ShaCompress: lambda f: shac.generate_trace(
            t.sha_compress_ops, min_rows=max(f, 128)),
        Table.ShaCompressSponge: lambda f: shacs.generate_trace(
            t.sha_compress_ops, min_rows=f),
        Table.Logic: lambda f: logic.generate_trace(
            t.logic_ops, min_rows=f),
        Table.Memory: lambda f: mem.generate_trace(
            t.memory_ops, min_rows=f),
    }
    out = []
    for tab in all_stark.tables:
        with timed("build trace", table=tab.name):
            out.append(builders[tab](floor_of(tab)))
    return out


def prove_segment(seg: Segment, config: Optional[StarkConfig] = None,
                  all_stark: Optional[AllStark] = None,
                  debug: bool = False,
                  block_path: str = "", assumptions=(),
                  assumption_usage: Optional[list] = None,
                  mesh=None, height_floors: Optional[dict] = None
                  ) -> SegmentReceipt:
    """Re-execute a segment and prove the implemented tables over it.

    mesh: optional 1-d "tp" Mesh — shards the proving kernels over it
    (prove_with_traces); dp = independent segments on disjoint
    submeshes.  height_floors: degree buckets (see segment_traces)."""
    config = config or StarkConfig.standard_fast_config()
    all_stark = all_stark or make_all_stark()
    with timed("prove_segment", segment=seg.segment_id):
        traces = segment_traces(seg, all_stark, block_path, assumptions,
                                assumption_usage,
                                height_floors=height_floors)
        pv = public_values_for_segment(seg)
        log("info", "proving tables: %s", ", ".join(
            f"{tab.name}={tr[0].shape[-1]}"
            for tab, tr in zip(all_stark.tables, traces)))
        proof = prove_with_traces(all_stark.starks, config, traces,
                                  all_stark.ctls, pv, debug=debug,
                                  mesh=mesh)
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


def prove_segments_with_assumptions(
        segments: List[Segment], assumptions=(),
        config: Optional[StarkConfig] = None,
        all_stark: Optional[AllStark] = None, debug: bool = False,
        block_path: str = ""):
    """Prove a segment chain under an assumption environment, producing a
    `Receipt` (Segments or Composite) — the reference's
    `prove_with_assumptions` + sha2-composition driver pattern
    (prover.rs:58-127, fixed_recursive_verifier.rs:835-914)."""
    from .receipts import (CompositeReceipt, InnerReceipt, Receipt,
                           ReceiptClaim)
    usage: list = []
    seg_receipts = [
        prove_segment(s, config, all_stark, debug=debug,
                      block_path=block_path, assumptions=assumptions,
                      assumption_usage=usage)
        for s in segments]
    check_receipt_chain(seg_receipts)
    inner = InnerReceipt(
        segments=seg_receipts,
        claim=ReceiptClaim(elf_id=seg_receipts[0].pre_image_id,
                           commit=seg_receipts[0].userdata))
    if usage:
        return Receipt.composite(CompositeReceipt(
            program_receipt=inner, assumptions_used=usage))
    return Receipt.segments(inner)
