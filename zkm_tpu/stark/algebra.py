"""Polymorphic field algebra for constraint evaluation.

Constraint code is written ONCE against this interface and evaluated in two
contexts (the reference achieves this with the `PackedField` /
`ExtensionTarget` generics of its `Stark` trait, prover/src/stark.rs):

  * `BatchAlgebra` — values are Gf arrays over all quotient-domain points
    (vectorized device evaluation inside the prover);
  * `ExtAlgebra`   — values are host (int, int) extension scalars
    (verifier evaluation at zeta; also the future recursive verifier).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import extension as gl2


class BatchAlgebra:
    """Values: Gf arrays of shape (M,) over evaluation points."""

    def __init__(self, m: int):
        self.m = m

    def constant(self, c: int):
        return gl.full((), c % gl.P)

    zero = property(lambda self: gl.zeros(()))
    one = property(lambda self: gl.ones(()))

    def add(self, a, b):
        return gl.add(a, b)

    def sub(self, a, b):
        return gl.sub(a, b)

    def mul(self, a, b):
        return gl.mul(a, b)

    def mul_const(self, a, c: int):
        return gl.mul(a, self.constant(c))

    def add_const(self, a, c: int):
        return gl.add(a, self.constant(c))

    def from_base(self, a):
        return a

    # scalar ops accept either python ints or () Gf pairs (traced values)
    def mul_scalar(self, a, s):
        return gl.mul(a, self.constant(s) if isinstance(s, int) else s)

    def add_scalar(self, a, s):
        return gl.add(a, self.constant(s) if isinstance(s, int) else s)

    # -- batched-constraint support -----------------------------------------
    # A "batch" of k constraints is a (k, M) Gf pair (vectorized over rows
    # AND constraints).

    def scalar_powers(self, alpha, k: int):
        """[alpha^0 .. alpha^k] as a list of () scalars (log-depth)."""
        pows = [self.one]
        for _ in range(k):
            pows.append(gl.mul(pows[-1], alpha))
        return pows

    def weighted_sum(self, values, pows, k: int):
        """sum_i pows[k-1-i] * values[i] for a (k, M) batch -> (M,)."""
        w_lo = jnp.stack([pows[k - 1 - i][0] for i in range(k)])
        w_hi = jnp.stack([pows[k - 1 - i][1] for i in range(k)])
        weights = (w_lo.reshape(k, 1), w_hi.reshape(k, 1))
        return gl.sum_axis(gl.mul(values, weights), axis=0)

    def scale_batch(self, values, s):
        """(k, M) * (M,) broadcast multiply."""
        return gl.mul(values, s)

    def stack_batch(self, items):
        """Stack k (M,) values into a (k, M) batch.

        Uses jnp.stack — callers must only pass *materialized or shallow*
        values (concat of deep producer chains hangs XLA CPU's LLVM)."""
        return (jnp.stack([v[0] for v in items]),
                jnp.stack([v[1] for v in items]))


class BatchRows:
    """Column view over a stacked (C, M) Gf trace for constraint code.

    `view[i]` -> column i as (M,); `view.rng(a, b)` -> columns [a, b) as a
    (k, M) constraint batch (zero-copy slices of the stacked array, so
    vectorized table code never stacks deep producers)."""

    def __init__(self, stacked: "gl.Gf"):
        self.stacked = stacked

    def __getitem__(self, i):
        return gl.getitem(self.stacked, (i, slice(None)))

    def rng(self, a, b):
        return gl.getitem(self.stacked, (slice(a, b), slice(None)))

    def __len__(self):
        return self.stacked[0].shape[0]


class ExtRows(list):
    """Host scalar counterpart of BatchRows (a list with .rng)."""

    def rng(self, a, b):
        return list(self[a:b])


def _listwise(op):
    """Broadcast an ExtAlgebra binary op over list-batches (the host
    counterpart of the (k, M) array batches)."""
    def wrapped(self, a, b):
        a_l, b_l = isinstance(a, list), isinstance(b, list)
        if a_l or b_l:
            if not a_l:
                a = [a] * len(b)
            if not b_l:
                b = [b] * len(a)
            return [op(self, x, y) for x, y in zip(a, b)]
        return op(self, a, b)
    return wrapped


class ExtAlgebra:
    """Values: host (c0, c1) int tuples in GF(p^2); batches are lists."""

    def constant(self, c: int):
        return (c % gl.P, 0)

    zero = property(lambda self: (0, 0))
    one = property(lambda self: (1, 0))

    @_listwise
    def add(self, a, b):
        return ((a[0] + b[0]) % gl.P, (a[1] + b[1]) % gl.P)

    @_listwise
    def sub(self, a, b):
        return ((a[0] - b[0]) % gl.P, (a[1] - b[1]) % gl.P)

    @_listwise
    def mul(self, a, b):
        return gl2.host_mul(a, b)

    def mul_const(self, a, c: int):
        if isinstance(a, list):
            return [self.mul_const(x, c) for x in a]
        return ((a[0] * c) % gl.P, (a[1] * c) % gl.P)

    def add_const(self, a, c: int):
        if isinstance(a, list):
            return [self.add_const(x, c) for x in a]
        return ((a[0] + c) % gl.P, a[1])

    def from_base(self, a: int):
        return (a % gl.P, 0)

    def mul_scalar(self, a, s: int):
        return self.mul_const(a, s)

    def add_scalar(self, a, s: int):
        return self.add_const(a, s)

    # -- batched-constraint support (a batch is a plain list of scalars) ----

    def scalar_powers(self, alpha, k: int):
        pows = [self.one]
        for _ in range(k):
            pows.append(self.mul(pows[-1], alpha))
        return pows

    def weighted_sum(self, values, pows, k: int):
        acc = self.zero
        for i in range(k):
            acc = self.add(acc, self.mul(pows[k - 1 - i], values[i]))
        return acc

    def scale_batch(self, values, s):
        return [self.mul(v, s) for v in values]

    def stack_batch(self, items):
        return list(items)
