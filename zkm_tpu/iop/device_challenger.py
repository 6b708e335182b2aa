"""Traced duplex-sponge challenger: the Fiat-Shamir transcript as data flow.

Mirrors `iop.challenger.Challenger` bit-for-bit, but every value is a
traced gl scalar, so whole prover phases (observe cap -> draw challenge ->
compute -> observe ...) fuse into a SINGLE jitted dispatch instead of one
host round trip per transcript step.  Over a remote-TPU tunnel each
round trip costs ~125 ms; a 6-table proof makes dozens of them
(BASELINE.md round-4 breakdown), so keeping the transcript on device is
the difference between latency-bound and compute-bound proving.

The buffer LENGTHS are Python-level (static at trace time) — a proof of a
fixed shape has a fixed transcript, which is exactly the property the
reference exploits to build fixed recursive circuits
(fixed_recursive_verifier.rs:377-495).  Only the VALUES are traced.

Use inside jit:

    spec, arrays = DeviceChallenger.from_host(host_ch).flatten()
    out_arrays, ... = jitted_phase(arrays, ...)      # spec is static
    host_ch2 = DeviceChallenger.unflatten(spec, out_arrays).to_host()
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..field import goldilocks as gl
from ..field import extension as gl2
from ..hash import poseidon as ps

RATE = ps.SPONGE_RATE      # 8
WIDTH = ps.SPONGE_WIDTH    # 12


class DeviceChallenger:
    def __init__(self, state: gl.Gf,
                 input_buffer: Sequence = (),
                 output_buffer: Sequence = ()):
        self.state = state                       # gl.Gf (12,)
        self.input_buffer: List = list(input_buffer)    # gl scalars
        self.output_buffer: List = list(output_buffer)  # gl scalars

    # -- host interop -------------------------------------------------------

    @classmethod
    def from_host(cls, ch) -> "DeviceChallenger":
        state = gl.from_u64(np.array(ch.state, dtype=np.uint64))
        inp = [gl.from_u64(np.uint64(x)) for x in ch.input_buffer]
        out = [gl.from_u64(np.uint64(x)) for x in ch.output_buffer]
        return cls(state, inp, out)

    def to_host(self):
        """One device->host fetch; returns an equivalent host Challenger."""
        from .challenger import Challenger
        vals = gl.to_u64_many([self.state] + self.input_buffer
                              + self.output_buffer)
        ch = Challenger(list(vals[0]))
        k = 1 + len(self.input_buffer)
        ch.input_buffer = [int(v) for v in vals[1:k]]
        ch.output_buffer = [int(v) for v in vals[k:]]
        return ch

    # -- jit-boundary flattening (spec is static, arrays are traced) --------

    def flatten(self):
        spec = (len(self.input_buffer), len(self.output_buffer))
        parts = [gl.reshape(x, (1,)) for x in
                 (self.input_buffer + self.output_buffer)]
        bufs = gl.concatenate(parts, axis=0) if parts else gl.zeros((0,))
        return spec, (self.state, bufs)

    @classmethod
    def unflatten(cls, spec, arrays) -> "DeviceChallenger":
        n_in, n_out = spec
        state, bufs = arrays
        inp = [gl.getitem(bufs, i) for i in range(n_in)]
        out = [gl.getitem(bufs, n_in + i) for i in range(n_out)]
        return cls(state, inp, out)

    # -- observe ------------------------------------------------------------

    def observe_element(self, e):
        self.output_buffer.clear()
        self.input_buffer.append(e)
        if len(self.input_buffer) == RATE:
            self._duplexing()

    def observe_elements(self, es: gl.Gf):
        for i in range(es[0].shape[0]):
            self.observe_element(gl.getitem(es, i))

    def observe_extension(self, e):
        self.observe_element(e[0])
        self.observe_element(e[1])

    def observe_cap(self, cap: gl.Gf):
        """cap: gl.Gf (n, 4) device digests."""
        n = cap[0].shape[0]
        flat = gl.reshape(cap, (4 * n,))
        self.observe_elements(flat)

    # -- squeeze ------------------------------------------------------------

    def get_challenge(self):
        if self.input_buffer or not self.output_buffer:
            self._duplexing()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> List:
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self) -> gl2.Gf2:
        c = self.get_n_challenges(2)
        return ((c[0][0], c[0][1]), (c[1][0], c[1][1]))

    # -- state management ---------------------------------------------------

    def compact(self) -> gl.Gf:
        if self.input_buffer:
            self._duplexing()
        self.output_buffer.clear()
        return self.state

    def _duplexing(self):
        assert len(self.input_buffer) <= RATE
        st = self.state
        for i, x in enumerate(self.input_buffer):
            st = gl.set_at(st, i, x)
        self.input_buffer.clear()
        self.state = ps.permute(st)
        self.output_buffer = [gl.getitem(self.state, i)
                              for i in range(RATE)]
