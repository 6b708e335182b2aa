"""Benchmark: end-to-end segment proving on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BENCH_MODE=prove, default): wall-clock of a full
`prove_segment` on the production default subset (SPONGE_SUBSET: 6 tables
incl. the Poseidon page-hash chain binding the image ids in-proof) —
witness generation -> trace build -> commit -> CTL data -> per-table
quotient/FRI — under the production standard_fast_config, after one
warm-up proof (compiles amortize across segments in production).
Reported as segment proofs per minute.

Fallback metric (BENCH_MODE=lde, or if the prove path fails): the LDE
microbench of round 1 (butterflies/s on the polynomial-commitment hot
kernel).

vs_baseline: the reference publishes no numbers (BASELINE.md) and no Rust
toolchain exists in this image.  The prove anchor is an estimated
reference single-host figure for the same tiny segment: plonky2 CPU
prover ~2.5 s/table-set at 2^16 max height on a 32-core host (measured
plonky2 benchmarks of comparable FFT+Merkle volume) -> ~24 proofs/min.
The LDE anchor is 4.8e9 butterflies/s (32-core rayon FFT estimate).
"""

import json
import os
import signal
import sys
import time

from zkm_tpu.utils.cache import enable_persistent_cache

# Without the persistent cache every bench run cold-compiles the whole
# 12-table prover (~1 h); with it only the first run on a host pays.
enable_persistent_cache()

BASELINE_PROOFS_PER_MIN = 24.0
BASELINE_BUTTERFLIES_PER_SEC = 4.8e9

# Wall-clock budget for the prove-mode metric.  If first-compile costs
# blow past it (fresh host, empty cache), fall back to the LDE metric so
# the driver always gets a JSON line.  Compiles done before the alarm
# fired are already persisted, so the *next* run completes the prove
# metric warm.
PROVE_BUDGET_S = int(os.environ.get("BENCH_PROVE_BUDGET_S", "1500"))


class _BenchTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise _BenchTimeout(f"prove bench exceeded {PROVE_BUDGET_S}s budget")


def bench_lde():
    import jax
    import numpy as np

    from zkm_tpu.field import goldilocks as gl
    from zkm_tpu.field import ntt

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

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

    iters = 3 if on_tpu else 2
    t0 = time.time()
    for _ in range(iters):
        out = lde_step(values)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters

    butterflies = c * (n * log_n // 2 + (n << rate_bits) * log_m // 2)
    rate = butterflies / dt
    return {
        "metric": "goldilocks_lde_butterflies_per_sec_per_chip",
        "value": round(rate),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / BASELINE_BUTTERFLIES_PER_SEC, 4),
    }


def bench_prove():
    from zkm_tpu.emulator.state import State
    from zkm_tpu.emulator.utils import split_prog_into_segs
    from zkm_tpu.host import prove_segment
    from zkm_tpu.stark.config import StarkConfig

    insns = [0x24080005, 0x2409000A, 0x01095020,
             0x3508BEEF, 0x01096824, 0x01097025,
             0xAE2A0000, 0x8E2B0000,
             0x24021096, 0x24040000, 0x0000000C]
    prog = b"".join(w.to_bytes(4, "big") for w in insns)
    state = State()
    state.memory.set_memory_range(0, prog)
    _, segs, _ = split_prog_into_segs(state, None, "", seg_size=1 << 20)
    cfg = StarkConfig.standard_fast_config()

    prove_segment(segs[0], cfg)          # warm-up: compiles
    t0 = time.time()
    prove_segment(segs[0], cfg)
    dt = time.time() - t0

    per_min = 60.0 / dt
    return {
        "metric": "segment_proofs_per_min_per_chip",
        "value": round(per_min, 3),
        "unit": "proofs/min",
        "vs_baseline": round(per_min / BASELINE_PROOFS_PER_MIN, 4),
    }


def main():
    mode = os.environ.get("BENCH_MODE", "prove")
    if mode == "prove":
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(PROVE_BUDGET_S)
        try:
            result = bench_prove()
        except Exception as e:
            # Disarm immediately: the LDE fallback below can outlive the
            # original budget, and a late SIGALRM would kill the run with
            # no JSON line at all.
            signal.alarm(0)
            print(f"prove bench failed ({e!r}); falling back to LDE",
                  file=sys.stderr)
            result = bench_lde()
        finally:
            signal.alarm(0)
    else:
        result = bench_lde()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
