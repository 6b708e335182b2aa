"""Benchmark: Goldilocks LDE (iNTT + coset NTT) throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: NTT butterflies/sec for the polynomial-commitment LDE of a
(C, N) -> (C, 4N) batch — the reference prover's #1 hot kernel
(PolynomialBatch::from_values, SURVEY.md §3.2).

vs_baseline: the reference publishes no numbers (BASELINE.md) and no Rust
toolchain exists in this image, so the anchor is an estimated reference
CPU figure: rayon-parallel plonky2 FFT ~1.5e8 butterflies/s/core x 32
cores = 4.8e9 butterflies/s for a production CPU host.  vs_baseline =
value / 4.8e9 (per-chip vs per-host; >1.0 means one TPU chip beats the
estimated full reference host).
"""

import json
import os
import sys
import time

BASELINE_BUTTERFLIES_PER_SEC = 4.8e9


def main():
    # Real-chip run: the axon TPU path uses the uint32-limb field kernels
    # (no x64; TPU has no native 64-bit integers).
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

    # butterflies: iNTT (N log N / 2 per poly) + forward NTT at 4N
    butterflies = c * (n * log_n // 2 + (n << rate_bits) * log_m // 2)
    rate = butterflies / dt
    print(json.dumps({
        "metric": "goldilocks_lde_butterflies_per_sec_per_chip",
        "value": round(rate),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / BASELINE_BUTTERFLIES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
