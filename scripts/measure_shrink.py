"""Shrink a REAL segment proof and publish the numbers (VERDICT r2 item 3).

Proves a real segment under the production default subset (SPONGE_SUBSET,
test_config FRI parameters on the CPU host), records the whole-AllProof
verifier as a DAG, builds the 5-table shrink circuit, proves + verifies
the shrink proof, and prints a stats table for STATUS.md:
  - DAG op counts (add/mul/const/inverse-hint/poseidon/asserts), wires
  - shrink table trace heights (VM / wire-mem / poseidon-call / Poseidon /
    program)
  - record / witness / prove / verify wall times
  - proof sizes (field elements) inner vs shrink

Usage:  timeout 3600 python scripts/measure_shrink.py [--subset sponge|default]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import tests.conftest  # noqa: F401  (CPU backend + cache)

import numpy as np  # noqa: E402

from zkm_tpu.emulator.state import State  # noqa: E402
from zkm_tpu.emulator.utils import split_prog_into_segs  # noqa: E402
from zkm_tpu.host import prove_segment, public_values_for_segment  # noqa: E402
from zkm_tpu.recursion import flatten_proof  # noqa: E402
from zkm_tpu.recursion.shrink import (PROGRAM, build_shrink_circuit,  # noqa: E402
                                      prove_shrink, verify_shrink)
from zkm_tpu.stark.all_stark import (DEFAULT_SUBSET, SPONGE_SUBSET,  # noqa: E402
                                     make_all_stark)
from zkm_tpu.stark.config import StarkConfig  # noqa: E402

PROGRAM_WORDS = [
    0x24080005, 0x2409000A, 0x01095020,            # li, li, add
    0x01096824, 0x01097025,                        # and, or
    0xAE2A0000, 0x8E2B0000,                        # sw, lw
    0x24021096, 0x24040000, 0x0000000C,            # exit_group(0)
]


def dag_stats(dag):
    kinds = {}
    for op in dag.prog:
        kinds[op[0]] = kinds.get(op[0], 0) + 1
    return kinds


def main():
    subset = SPONGE_SUBSET if "default" not in sys.argv else DEFAULT_SUBSET
    name = "SPONGE_SUBSET" if subset is SPONGE_SUBSET else "DEFAULT_SUBSET"

    prog = b"".join(w.to_bytes(4, "big") for w in PROGRAM_WORDS)
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    seg = segs[0]

    config = StarkConfig.test_config()
    all_stark = make_all_stark(subset)

    t0 = time.time()
    receipt = prove_segment(seg, config, all_stark)
    t_prove_inner = time.time() - t0
    inner = receipt.proof
    inner_size = len(flatten_proof(inner))

    t0 = time.time()
    circuit = build_shrink_circuit(all_stark.starks, all_stark.ctls, config,
                                   inner)
    t_record = time.time() - t0

    dag = circuit.vdag.dag
    kinds = dag_stats(dag)

    t0 = time.time()
    shrink_proof = prove_shrink(circuit, inner)
    t_shrink = time.time() - t0

    t0 = time.time()
    verify_shrink(circuit, shrink_proof)
    t_verify = time.time() - t0
    shrink_size = len(flatten_proof(shrink_proof))

    heights = {type(s).__name__: p.proof.recover_degree_bits(config)
               for s, p in zip(circuit.starks, shrink_proof.stark_proofs)}

    print()
    print(f"## Shrink of a real segment proof ({name}, test_config)")
    print()
    print(f"| quantity | value |")
    print(f"|---|---|")
    print(f"| inner tables | {len(all_stark.tables)} "
          f"({', '.join(t.name for t in all_stark.tables)}) |")
    print(f"| inner proof size | {inner_size} field elements |")
    print(f"| inner prove time | {t_prove_inner:.1f} s |")
    print(f"| DAG wires | {dag.n} |")
    print(f"| DAG ops | {sum(kinds.values())} "
          f"({', '.join(f'{k}:{v}' for k, v in sorted(kinds.items()))}) |")
    print(f"| DAG poseidon calls | {dag.num_poseidons} |")
    print(f"| DAG asserts | {len(dag.asserts)} |")
    print(f"| DAG public inputs | {len(dag.pub)} |")
    print(f"| record time | {t_record:.1f} s |")
    print(f"| shrink table degree bits | "
          f"{', '.join(f'{k}:2^{v}' for k, v in heights.items())} |")
    print(f"| shrink witness+prove time | {t_shrink:.1f} s |")
    print(f"| shrink verify time | {t_verify:.1f} s |")
    print(f"| shrink proof size | {shrink_size} field elements "
          f"({shrink_size / inner_size:.2f}x inner) |")
    print(f"| program cap (verifying key) | "
          f"{np.asarray(circuit.program_cap).shape} |")


if __name__ == "__main__":
    main()
