"""Measured FULL 12-table proof at standard_fast_config (VERDICT r4 item 4).

Proves the full-table-family guest (same as tests/test_full_system.py)
through all 12 tables + 15 CTLs at the PRODUCTION config, verifies it,
and prints per-table heights + phase wall-clock — the numbers BASELINE.md
§full-system records.  Platform: TPU by default (run on CPU with
ZKM_STAGE_PLATFORM=cpu).

Usage: python scripts/full_system_measured.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("ZKM_LOG", "info")
platform = os.environ.get("ZKM_STAGE_PLATFORM", "")

import jax  # noqa: E402

if platform:
    jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        jax.config.update("jax_enable_x64", True)

from zkm_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from zkm_tpu.emulator.state import State  # noqa: E402
from zkm_tpu.emulator.utils import split_prog_into_segs  # noqa: E402
from zkm_tpu.host import prove_segment, verify_segment_receipt  # noqa: E402
from zkm_tpu.stark.all_stark import FULL_SUBSET, make_all_stark  # noqa: E402
from zkm_tpu.stark.config import StarkConfig  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_full_system import build_full_guest  # noqa: E402


def main():
    backend = jax.default_backend()
    device = str(jax.devices()[0])
    print(f"[full-system] backend={backend} device={device}", flush=True)

    prog = build_full_guest()
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    assert len(segs) == 1
    seg = segs[0]

    config = StarkConfig.standard_fast_config()
    all_stark = make_all_stark(FULL_SUBSET)
    assert len(all_stark.ctls) == 15 and all_stark.num_tables == 12

    t0 = time.time()
    receipt = prove_segment(seg, config, all_stark)
    prove_s = time.time() - t0
    heights = {tab.name: pm.degree_bits for tab, pm in
               zip(all_stark.tables, receipt.proof.stark_proofs)}
    print(f"[full-system] proved in {prove_s:.1f}s; heights={heights}",
          flush=True)

    t0 = time.time()
    verify_segment_receipt(receipt, config, all_stark)
    verify_s = time.time() - t0
    print(f"[full-system] verified in {verify_s:.1f}s", flush=True)

    t0 = time.time()
    receipt2 = prove_segment(seg, config, all_stark)
    warm_s = time.time() - t0
    verify_segment_receipt(receipt2, config, all_stark)
    print(json.dumps({
        "workload": "full_guest(add/logic/mem/sha/keccak + sponge chain)",
        "config": "standard_fast_config", "tables": 12, "ctls": 15,
        "backend": backend, "device": device,
        "heights_log2": heights, "steps": seg.step,
        "cold_prove_s": round(prove_s, 1),
        "warm_prove_s": round(warm_s, 1),
        "verify_s": round(verify_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
