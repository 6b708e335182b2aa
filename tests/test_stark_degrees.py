"""Low-degree checks for every implemented table (reference stark_testing)."""

import pytest

from zkm_tpu.recursion.shrink import (PoseidonCallStark, VerifierProgramStark,
                                      VerifierVmStark, WireMemStark)
from zkm_tpu.stark.stark_testing import check_stark_low_degree
from zkm_tpu.tables.arithmetic import ArithmeticStark
from zkm_tpu.tables.logic import LogicStark
from zkm_tpu.tables.memory import MemoryStark
from zkm_tpu.tables.poseidon import PoseidonStark


@pytest.mark.parametrize("stark_cls", [
    LogicStark, MemoryStark, ArithmeticStark, PoseidonStark,
    VerifierVmStark, WireMemStark, PoseidonCallStark, VerifierProgramStark])
def test_low_degree(stark_cls):
    check_stark_low_degree(stark_cls())
