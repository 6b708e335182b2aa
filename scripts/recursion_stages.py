"""Staged recursion-on-real-segments driver (VERDICT r4 item 1).

Each stage runs in its own fresh process; state crosses stages as pickle
files under OUT.  This isolates XLA:CPU's executable-accumulation
segfault (see pytest.ini / tests/conftest.py) so each compile-heavy phase
starts with a clean slate, and lets a crashed stage be re-run without
repaying the earlier ones.

Usage: python scripts/recursion_stages.py <stage> [outdir]
  segments   prove 2 real fib segments (3-table subset), save receipts
  shrink     build shrink circuit + prove_shrink + verify on receipt 0
  aggregate  shrink both receipts, aggregate, verify the root
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ["JAX_PLATFORMS"] = os.environ.get("ZKM_STAGE_PLATFORM", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402,F401

OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/zkm_recursion_stages"
SUBSET_NAMES = ("Cpu", "Logic", "Memory")


def _fixture_inputs():
    from zkm_tpu.stark.all_stark import Table, make_all_stark
    from zkm_tpu.stark.config import StarkConfig
    subset = tuple(getattr(Table, n) for n in SUBSET_NAMES)
    return StarkConfig.test_config(), make_all_stark(subset)


def stage_segments():
    from zkm_tpu.emulator.state import State
    from zkm_tpu.emulator.utils import split_prog_into_segs
    from zkm_tpu.host import prove_segment, verify_segment_receipt
    from zkm_tpu.runtime.examples import build_fib_guest

    config, all_stark = _fixture_inputs()
    prog = build_fib_guest(40)
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1800)
    assert len(segs) >= 2
    receipts = []
    for i, seg in enumerate(segs[:2]):
        t0 = time.time()
        r = prove_segment(seg, config, all_stark)
        print(f"[stage:segments] segment {i} proved in "
              f"{time.time()-t0:.0f}s", flush=True)
        verify_segment_receipt(r, config, all_stark)
        receipts.append(r)
    with open(os.path.join(OUT, "receipts.pkl"), "wb") as f:
        pickle.dump(receipts, f)
    print("[stage:segments] done", flush=True)


def _load_receipts():
    with open(os.path.join(OUT, "receipts.pkl"), "rb") as f:
        return pickle.load(f)


def stage_shrink():
    from zkm_tpu.recursion.shrink import (build_shrink_circuit,
                                          prove_shrink, verify_shrink)
    config, all_stark = _fixture_inputs()
    receipts = _load_receipts()
    inner = receipts[0].proof

    t0 = time.time()
    circuit = build_shrink_circuit(
        all_stark.starks, all_stark.ctls, config, inner)
    print(f"[stage:shrink] circuit recorded in {time.time()-t0:.0f}s: "
          f"wires={circuit.vdag.dag.n} "
          f"poseidons={circuit.vdag.dag.num_poseidons} "
          f"ops={len(circuit.vdag.dag.prog)}", flush=True)

    t0 = time.time()
    shrunk = prove_shrink(circuit, inner)
    print(f"[stage:shrink] proved in {time.time()-t0:.0f}s; heights="
          f"{[pm.degree_bits for pm in shrunk.stark_proofs]}", flush=True)
    verify_shrink(circuit, shrunk)
    assert shrunk.public_values.roots_before.root == \
        inner.public_values.roots_before.root
    with open(os.path.join(OUT, "shrunk.pkl"), "wb") as f:
        pickle.dump(shrunk, f)
    print("[stage:shrink] done", flush=True)


def stage_aggregate():
    from zkm_tpu.recursion.aggregate import AggregationTree
    from zkm_tpu.recursion.shrink import build_shrink_circuit, verify_shrink
    config, all_stark = _fixture_inputs()
    receipts = _load_receipts()
    t0 = time.time()
    circuit = build_shrink_circuit(
        all_stark.starks, all_stark.ctls, config, receipts[0].proof)
    tree = AggregationTree(circuit)
    items = [tree.shrink(r.proof) for r in receipts]
    print(f"[stage:aggregate] 2 shrinks in {time.time()-t0:.0f}s",
          flush=True)
    t0 = time.time()
    root = tree.aggregate(items)
    verify_shrink(tree.circuit_for(root), root.proof)
    print(f"[stage:aggregate] root in {time.time()-t0:.0f}s", flush=True)
    assert root.proof.public_values.roots_before.root == \
        receipts[0].proof.public_values.roots_before.root
    assert root.proof.public_values.roots_after.root == \
        receipts[1].proof.public_values.roots_after.root
    with open(os.path.join(OUT, "agg_root.pkl"), "wb") as f:
        pickle.dump({"proof": root.proof,
                     "program_cap": tree.circuit_for(root).program_cap}, f)
    print("[stage:aggregate] done", flush=True)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    stage = sys.argv[1]
    t0 = time.time()
    {"segments": stage_segments,
     "shrink": stage_shrink,
     "aggregate": stage_aggregate}[stage]()
    print(f"[stage:{stage}] total {time.time()-t0:.0f}s", flush=True)
