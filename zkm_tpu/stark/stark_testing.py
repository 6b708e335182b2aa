"""Per-STARK testing harnesses.

Reference: /root/reference/prover/src/stark_testing.rs —
`test_stark_low_degree` evaluates a table's constraints on the low-degree
extension of a *random* trace and checks the composed constraint polynomial
stays within the declared degree bound (catching accidental degree-4+
constraints, wrong selector usage, etc.).
"""

from __future__ import annotations

import numpy as np

from ..field import goldilocks as gl
from ..field import ntt
from .algebra import BatchAlgebra, BatchRows
from .constraint_consumer import ConstraintConsumer

P = gl.P


def check_stark_low_degree(stark, degree_bits: int = 3, seed: int = 0):
    """Raises AssertionError if any composed constraint exceeds degree
    3*(n-1) + n (constraint degree x trace degree plus one selector)."""
    n = 1 << degree_bits
    rate_bits = 3
    m = n << rate_bits
    rng = np.random.default_rng(seed)
    values = gl.from_u64(rng.integers(0, P, size=(stark.num_columns, n),
                                      dtype=np.uint64))
    coeffs = ntt.intt(values)
    lde = ntt.lde(coeffs, rate_bits)           # coset g*H_m, natural order

    step = 1 << rate_bits
    nxt_idx = ((np.arange(m) + step) % m).astype(np.int32)
    local = BatchRows(lde)
    nxt = BatchRows(gl.take(lde, nxt_idx, axis=-1))

    # polynomial selectors evaluated over the coset
    xs_np = (gl.host_powers(gl.primitive_root_of_unity(
        degree_bits + rate_bits), m).astype(object) * gl.GENERATOR) % P
    xs = gl.from_u64(xs_np.astype(np.uint64))
    g_last = gl.host_pow(gl.primitive_root_of_unity(degree_bits), n - 1)
    z_last = gl.sub(xs, gl.full((), g_last))
    # Z_H(x) = x^n - 1 over the coset
    zh = gl.sub(gl.pow_const(xs, n), gl.ones((m,)))
    n_inv = gl.host_inv(n)
    lag_first = gl.mul(gl.mul(zh, gl.full((), n_inv)),
                       gl.inverse(gl.sub(xs, gl.ones((m,)))))
    lag_last = gl.mul(gl.mul(zh, gl.full((), (n_inv * g_last) % P)),
                      gl.inverse(gl.sub(xs, gl.full((), g_last))))

    algebra = BatchAlgebra(m)
    alphas = [gl.full((), 3), gl.full((), 5)]
    consumer = ConstraintConsumer(algebra, alphas, z_last, lag_first,
                                  lag_last)
    if stark.num_public_inputs:
        pubs = [gl.full((), int(v)) for v in rng.integers(
            0, P, size=stark.num_public_inputs, dtype=np.uint64)]
        stark.eval_generic(algebra, local, nxt, consumer, pubs)
    else:
        stark.eval_generic(algebra, local, nxt, consumer)

    max_degree = 3 * (n - 1) + n
    for k, acc in enumerate(consumer.accs):
        acc_coeffs = gl.to_u64(ntt.coset_intt(gl.reshape(acc, (1, m))))[0]
        high = np.nonzero(acc_coeffs)[0]
        deg = int(high[-1]) if high.size else 0
        assert deg <= max_degree, \
            f"constraint accumulator {k} has degree {deg} > {max_degree}"
