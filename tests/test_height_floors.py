"""Degree-bucket height floors (VERDICT r4 missing #6).

Production proves a stream of segments with varying natural table
heights; each new height combination compiles a fresh XLA graph set.
With per-table height floors (the analog of the reference's per-table
circuit degree ranges, recursion/src/lib.rs:32-45) all segments of a
workload class land on ONE shape set, so compiles amortize.

Asserts (a) two programs with different natural Cpu heights bucket to
identical shapes, (b) both proofs verify at the padded heights, and
(c) the second prove compiles ZERO new XLA graphs.
"""

from zkm_tpu.emulator.state import State
from zkm_tpu.emulator.utils import split_prog_into_segs
from zkm_tpu.host import prove_segment, verify_segment_receipt
from zkm_tpu.stark.all_stark import Table, make_all_stark
from zkm_tpu.stark.config import StarkConfig
from zkm_tpu.utils.cache import install_compile_monitor

SUBSET = (Table.Cpu, Table.Logic, Table.Memory)


def _segment(insns):
    prog = b"".join(w.to_bytes(4, "big") for w in insns)
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    assert len(segs) == 1
    return segs[0]


# exit_group(0) tail
_EXIT = [0x24021096, 0x24040000, 0x0000000C]
# short: a few ALU ops then exit (natural Cpu height = bootstrap ~2^11)
_SHORT = [0x24080005, 0x2409000A, 0x01095020, 0x3508BEEF] + _EXIT
# long: li t0,1500; loop: addiu t0,-1; bne t0,zero,loop; nop (delay slot)
# ~3000 executed steps push the natural Cpu height past the short one
_LONG = [0x240805DC,              # addiu t0, zero, 1500
         0x2508FFFF,              # addiu t0, t0, -1
         0x1500FFFE,              # bne   t0, zero, -2 insns
         0x00000000,              # nop (delay slot)
         0x3508BEEF] + _EXIT      # ori touches the logic table


def test_height_floors_bucket_shapes():
    config = StarkConfig.test_config()
    all_stark = make_all_stark(SUBSET)
    floors = {Table.Cpu: 1 << 13, Table.Logic: 1 << 7}

    seg_short, seg_long = _segment(_SHORT), _segment(_LONG)
    assert seg_long.step > 2500  # the loop actually ran

    stats = install_compile_monitor()
    receipts, heights = [], []
    for seg in (seg_short, seg_long):
        r = prove_segment(seg, config, all_stark, height_floors=floors)
        receipts.append(r)
        heights.append([pm.degree_bits for pm in r.proof.stark_proofs])
        if seg is seg_short:
            first_compiles = stats["compiles"]

    # different natural heights, identical bucketed shapes
    assert heights[0] == heights[1], heights
    by_table = dict(zip(all_stark.tables, heights[0]))
    assert by_table[Table.Cpu] == 13
    assert by_table[Table.Logic] == 7

    # the whole point: the second prove reuses every compiled graph
    assert stats["compiles"] == first_compiles, (
        f"second prove recompiled "
        f"{stats['compiles'] - first_compiles} graphs")

    for r in receipts:
        verify_segment_receipt(r, config, all_stark)


def test_env_floor_parsing(monkeypatch):
    from zkm_tpu.host import height_floors_from_env
    monkeypatch.setenv("ZKM_HEIGHT_FLOORS", "Cpu=16, Memory=17")
    floors = height_floors_from_env()
    assert floors == {Table.Cpu: 1 << 16, Table.Memory: 1 << 17}
    monkeypatch.setenv("ZKM_HEIGHT_FLOORS", "")
    assert height_floors_from_env() == {}
