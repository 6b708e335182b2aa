"""Benchmark: end-to-end segment proving on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "platform": ..., "device": ...}

Primary metric (BENCH_MODE=prove, default, requires a TPU): wall-clock of
a full `prove_segment` on a REAL 65536-cycle segment of the reference's
Go `hello` binary (~372k MIPS instructions over 8 segments; VERDICT r4
item 3 retired the 11-instruction toy as the headline workload) on the
production default subset (SPONGE_SUBSET: 6 tables incl. the Poseidon
page-hash chain binding the image ids in-proof) under the production
standard_fast_config, after one warm-up proof (compiles amortize across
segments in production; they also persist to .jax_cache, so even a
budget-aborted warm-up makes the NEXT run warmer).  Reported as segment
proofs per minute.  The pipeline being timed is the analog of reference
prover/src/prover.rs:130-232 (trace commit -> CTL data -> per-table
aux/quotient/FRI) plus witness generation.

Fallback chain: hello-segment prove -> tiny-segment prove (the r2-r4
metric, kept comparable across rounds) -> LDE throughput (no-TPU or
everything over budget).  The emitted JSON always records which
platform/device/workload actually ran: a CPU fallback must never be
mistaken for a chip number (VERDICT r3 weak #1).

vs_baseline: the reference publishes no numbers (BASELINE.md) and this
image has no Rust toolchain to measure it, so the anchors are estimates
(flagged via "baseline_estimated": true): a plonky2-class 32-core CPU
prover at ~1.5 proofs/min on the hello-segment shape (Cpu 2^16 x 260
cols, Memory 2^19, Arithmetic 2^16 + sponge tables), ~24/min at the tiny
shape, 4.8e9 butterflies/s for the 32-core rayon LDE.
"""

import json
import os
import signal
import subprocess
import sys
import time

CACHE_DIR = None


def _enable_cache():
    """Persistent compile cache: without it every bench run cold-compiles
    the whole prover; with it only the first run on a host pays (works
    for the axon TPU backend too — fresh-process recompile of a cached
    graph is ~10x faster).  Called in workload children only; the
    orchestrating parent never initializes jax."""
    global CACHE_DIR
    from zkm_tpu.utils.cache import enable_persistent_cache
    CACHE_DIR = enable_persistent_cache()

HELLO_ELF = "/root/reference/emulator/test-vectors/hello"
BASELINE_HELLO_PROOFS_PER_MIN = 1.5
BASELINE_PROOFS_PER_MIN = 24.0
BASELINE_BUTTERFLIES_PER_SEC = 4.8e9

# Wall-clock budget for the prove-mode metric.  Compiles persisted before
# the alarm make the *next* run warmer, so a cold host converges to a
# completed prove metric across rounds even if one run falls back.
PROVE_BUDGET_S = int(os.environ.get("BENCH_PROVE_BUDGET_S", "1500"))


class _BenchTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise _BenchTimeout(f"prove bench exceeded budget")


def _device_info():
    import jax
    dev = jax.devices()[0]
    return jax.default_backend(), str(dev)


def bench_lde():
    import jax
    import numpy as np

    from zkm_tpu.field import goldilocks as gl
    from zkm_tpu.field import ntt

    platform, device = _device_info()
    on_tpu = platform != "cpu"
    dev = jax.devices()[0]

    c = 64
    log_n = 14 if on_tpu else 12
    n = 1 << log_n
    rate_bits = 2
    log_m = log_n + rate_bits

    rng = np.random.default_rng(0)
    values = gl.from_u64(rng.integers(0, gl.P, size=(c, n), dtype=np.uint64))
    values = jax.device_put(values, dev)

    @jax.jit
    def lde_step(v):
        coeffs = ntt.intt(v)
        return ntt.lde(coeffs, rate_bits)

    out = lde_step(values)
    jax.block_until_ready(out)

    # Queue all iterations before blocking once: async dispatch pipelines
    # the device work, so per-dispatch (tunnel) latency amortizes instead
    # of serializing into the measurement.
    iters = 30 if on_tpu else 3
    t0 = time.time()
    outs = [lde_step(values) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / iters

    butterflies = c * (n * log_n // 2 + (n << rate_bits) * log_m // 2)
    rate = butterflies / dt
    return {
        "metric": "goldilocks_lde_butterflies_per_sec_per_chip",
        "value": round(rate),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / BASELINE_BUTTERFLIES_PER_SEC, 4),
        "platform": platform,
        "device": device,
        "baseline_estimated": True,
    }


def _toy_segment():
    from zkm_tpu.emulator.state import State
    from zkm_tpu.emulator.utils import split_prog_into_segs

    insns = [0x24080005, 0x2409000A, 0x01095020,
             0x3508BEEF, 0x01096824, 0x01097025,
             0xAE2A0000, 0x8E2B0000,
             0x24021096, 0x24040000, 0x0000000C]
    prog = b"".join(w.to_bytes(4, "big") for w in insns)
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    return segs[0]


def _hello_segment():
    from zkm_tpu.emulator.utils import (load_elf_with_patch,
                                        split_prog_into_segs)
    state = load_elf_with_patch(HELLO_ELF, ["x"], native=True)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=65536)
    return segs[0]


def _prove_twice(seg, workload: str, anchor: float):
    """Warm-up prove + timed prove; returns the bench JSON dict."""
    from zkm_tpu.host import prove_segment
    from zkm_tpu.stark.config import StarkConfig
    from zkm_tpu.utils.cache import install_compile_monitor

    from zkm_tpu.stark.all_stark import make_all_stark

    platform, device = _device_info()
    cfg = StarkConfig.standard_fast_config()
    cstats = install_compile_monitor()

    print(f"[bench] workload={workload} steps={seg.step} "
          f"platform={platform} device={device} cache={CACHE_DIR}",
          file=sys.stderr, flush=True)
    t0 = time.time()
    receipt = prove_segment(seg, cfg)     # warm-up: compiles (persisted)
    warm_dt = time.time() - t0
    heights = {t.name: pm.degree_bits for t, pm in zip(
        make_all_stark().tables, receipt.proof.stark_proofs)}
    print(f"[bench] warm-up proof done in {warm_dt:.1f}s "
          f"heights={heights} (XLA compiles: {cstats['compiles']} graphs, "
          f"{cstats['secs']:.1f}s = "
          f"{100 * cstats['secs'] / max(warm_dt, 1e-9):.0f}% of "
          f"wall-clock; persistent-cache hits: {cstats['cache_hits']})",
          file=sys.stderr, flush=True)
    warm_compiles = cstats["compiles"]

    t0 = time.time()
    prove_segment(seg, cfg)
    dt = time.time() - t0
    timed_compiles = cstats["compiles"] - warm_compiles
    print(f"[bench] timed proof done in {dt:.1f}s "
          f"(compiles during timed run: {timed_compiles})",
          file=sys.stderr, flush=True)

    per_min = 60.0 / dt
    return {
        "metric": f"{workload}_segment_proofs_per_min_per_chip",
        "value": round(per_min, 3),
        "unit": "proofs/min",
        "vs_baseline": round(per_min / anchor, 4),
        "platform": platform,
        "device": device,
        "baseline_estimated": True,
        "workload": workload,
        "steps": seg.step,
        "heights_log2": heights,
        "config": "standard_fast_config",
        "subset": "SPONGE_SUBSET(6 tables)",
        "warmup_s": round(warm_dt, 1),
        "compiled_graphs": warm_compiles,
        "compiles_in_timed_run": timed_compiles,
    }


def bench_prove_hello():
    return _prove_twice(_hello_segment(), "hello",
                        BASELINE_HELLO_PROOFS_PER_MIN)


def bench_prove_toy():
    return _prove_twice(_toy_segment(), "tiny", BASELINE_PROOFS_PER_MIN)


def _run_child(mode: str, budget_s: int):
    """One workload attempt in a FRESH process.

    Isolation matters twice over: (a) a TPU RESOURCE_EXHAUSTED poisons
    the whole tunnel session — after one OOM, even a tiny follow-up
    workload fails in the same process (observed; the r5 prewarm's tiny
    AND lde fallbacks died after the hello OOM); (b) the budget can be
    enforced with a hard kill without losing the parent.  Returns the
    child's JSON dict or None."""
    env = dict(os.environ)
    env["BENCH_MODE"] = mode
    env["BENCH_PROVE_BUDGET_S"] = str(int(budget_s))
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)], env=env,
            timeout=budget_s + 120, stdout=subprocess.PIPE, stderr=None)
    except subprocess.TimeoutExpired:
        print(f"[bench] {mode} child exceeded {budget_s}s + grace; killed",
              file=sys.stderr, flush=True)
        return None
    out = proc.stdout.decode(errors="replace").strip().splitlines()
    print(f"[bench] {mode} child rc={proc.returncode} "
          f"in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    for line in reversed(out):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def _run_mode_inline(mode: str):
    _enable_cache()
    platform, _ = _device_info()
    if mode.startswith("prove") and platform == "cpu":
        print("[bench] ERROR: no TPU visible (platform=cpu) — the prove "
              "metric is TPU-only; emitting the LDE fallback with "
              "platform=cpu so it cannot be mistaken for a chip number",
              file=sys.stderr, flush=True)
        mode = "lde"
    if mode.startswith("prove"):
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(PROVE_BUDGET_S)
        try:
            return bench_prove_hello() if mode == "prove_hello" \
                else bench_prove_toy()
        finally:
            signal.alarm(0)
    return bench_lde()


def main():
    mode = os.environ.get("BENCH_MODE", "auto")
    if mode != "auto":
        result = _run_mode_inline(mode)
        print(json.dumps(result), flush=True)
        return

    # Orchestrate fresh-process attempts: hello (the headline workload)
    # -> tiny (comparable to r2-r4 numbers) -> LDE (always succeeds).
    budget = PROVE_BUDGET_S
    attempts = [("prove_hello", max(300, int(budget * 0.55))),
                ("prove_toy", max(240, int(budget * 0.35))),
                ("lde", 240)]
    if not os.path.exists(HELLO_ELF):
        attempts = attempts[1:]
    for mode_i, budget_i in attempts:
        result = _run_child(mode_i, budget_i)
        if result is not None:
            print(json.dumps(result), flush=True)
            return
        print(f"[bench] {mode_i} produced no result; next fallback",
              file=sys.stderr, flush=True)
    print(json.dumps({"metric": "bench_failed", "value": 0,
                      "unit": "none", "vs_baseline": 0}), flush=True)


if __name__ == "__main__":
    main()
