"""AllStark: the 12-table zkVM STARK system and its cross-table lookups.

Reference: /root/reference/prover/src/all_stark.rs — Table enum (12 tables,
all_stark.rs:96-110), NUM_TABLES=12, MIN_TRACE_LEN=64, and the 15 CTLs
(arithmetic, poseidon sponge/inputs/outputs, keccak sponge/inputs/outputs,
sha-extend sponge/inputs/outputs, sha-compress sponge/inputs/outputs, logic,
memory).

Round-1 status: Arithmetic, Logic, and Memory starks are implemented; the
remaining tables are registered as placeholders (class + column counts land
with their implementations).  `make_all_stark(subset=...)` builds a working
system over any implemented subset so integration grows table by table.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum
from typing import Dict, List, Optional, Sequence

from ..tables import arithmetic as arith_mod
from ..tables import logic as logic_mod
from ..tables import memory as memory_mod
from ..tables import poseidon as poseidon_mod
from .cross_table_lookup import CrossTableLookup, TableWithColumns


class Table(IntEnum):
    """Table indices (reference all_stark.rs:96-110)."""
    Arithmetic = 0
    Cpu = 1
    Poseidon = 2
    PoseidonSponge = 3
    Keccak = 4
    KeccakSponge = 5
    ShaExtend = 6
    ShaExtendSponge = 7
    ShaCompress = 8
    ShaCompressSponge = 9
    Logic = 10
    Memory = 11


NUM_TABLES = 12
MIN_TRACE_LEN = 64

# Tables with a working Stark implementation this round.
IMPLEMENTED: Dict[Table, object] = {
    Table.Arithmetic: arith_mod.ArithmeticStark,
    Table.Poseidon: poseidon_mod.PoseidonStark,
    Table.Logic: logic_mod.LogicStark,
    Table.Memory: memory_mod.MemoryStark,
}

# Default proving subset (host SDK): the tables the witness extractor
# currently populates.  Poseidon joins once the sponge/bootstrap witness
# fills it.
DEFAULT_SUBSET = (Table.Arithmetic, Table.Logic, Table.Memory)


@dataclass
class AllStark:
    """A STARK system over a (sub)set of the 12 tables.

    `tables` maps system-local indices 0..k-1 to Table ids; `starks` and
    `ctls` use the local indices (so a 3-table subset proves standalone)."""
    tables: List[Table]
    starks: List[object]
    ctls: List[CrossTableLookup]

    @property
    def num_tables(self) -> int:
        return len(self.tables)


def make_all_stark(subset: Optional[Sequence[Table]] = None,
                   self_ctls: bool = True) -> AllStark:
    """Build the system over `subset` (default: all implemented tables).

    Until the CPU table lands, real cross-table links (cpu<->memory,
    cpu<->logic, cpu<->arithmetic) cannot be expressed, so each table gets a
    self-CTL exercising the full aux/Z machinery.  The final CTL topology
    (15 lookups, all_stark.rs:136-154) replaces these as tables land."""
    subset = list(subset) if subset is not None else list(DEFAULT_SUBSET)
    assert all(t in IMPLEMENTED for t in subset), "unimplemented table"
    starks = [IMPLEMENTED[t]() for t in subset]

    _ctl_mods = {Table.Arithmetic: arith_mod, Table.Logic: logic_mod,
                 Table.Memory: memory_mod}
    ctls = []
    if self_ctls:
        for local, t in enumerate(subset):
            if t in _ctl_mods:
                mod = _ctl_mods[t]
                cols = tuple(mod.ctl_data())
                filt = mod.ctl_filter()
            else:
                cols = tuple(poseidon_mod.ctl_data_inputs())
                filt = poseidon_mod.ctl_filter()
            ctls.append(CrossTableLookup(
                (TableWithColumns(local, cols, filt),),
                TableWithColumns(local, cols, filt)))
    return AllStark(tables=subset, starks=starks, ctls=ctls)
