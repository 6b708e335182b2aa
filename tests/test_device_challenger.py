"""DeviceChallenger == host Challenger, bit for bit, including buffer
carry-over across jit boundaries (the device transcript must replay the
exact duplex discipline or every proof breaks)."""

import jax
import numpy as np
import pytest

from zkm_tpu.field import goldilocks as gl
from zkm_tpu.iop.challenger import Challenger
from zkm_tpu.iop.device_challenger import DeviceChallenger


def _script(ch, observe, draw):
    """Interleaved observe/draw schedule exercising partial buffers,
    duplex-on-demand, and cap observation."""
    out = []
    observe(ch, [3, 5, 7])                      # partial input buffer
    out.append(draw(ch))                        # forces duplex
    observe(ch, list(range(11)))                # crosses RATE boundary
    out.extend(draw(ch) for _ in range(10))     # drains + refills
    observe(ch, [gl.P - 1])
    out.append(draw(ch))
    return out


def test_matches_host_challenger():
    host = Challenger()
    host_out = _script(
        host,
        lambda c, es: c.observe_elements(es),
        lambda c: c.get_challenge())

    dev = DeviceChallenger.from_host(Challenger())
    dev_out = _script(
        dev,
        lambda c, es: c.observe_elements(
            gl.from_u64(np.array(es, dtype=np.uint64))),
        lambda c: c.get_challenge())
    got = [int(v) for v in gl.to_u64_many(dev_out)]
    assert got == host_out


def test_observe_cap_and_compact():
    rng = np.random.default_rng(0)
    cap = rng.integers(0, gl.P, size=(4, 4), dtype=np.uint64)

    host = Challenger()
    host.observe_cap(cap)
    host_alpha = host.get_challenge()
    host_state = host.compact()

    dev = DeviceChallenger.from_host(Challenger())
    dev.observe_cap(gl.from_u64(cap))
    dev_alpha = dev.get_challenge()
    dev_state = dev.compact()
    alpha_u64, state_u64 = gl.to_u64_many([dev_alpha, dev_state])
    assert int(alpha_u64) == host_alpha
    assert list(state_u64) == host_state


def test_round_trip_through_jit_boundary():
    """Flatten -> jitted phase (observe + draw) -> unflatten -> to_host
    stays in lock-step with a host challenger running the same script."""
    host = Challenger()
    host.observe_elements([1, 2, 3])            # leaves a partial buffer

    dev = DeviceChallenger.from_host(host.clone())
    spec, arrays = dev.flatten()

    def phase(arrays, cap):
        ch = DeviceChallenger.unflatten(spec, arrays)
        ch.observe_cap(cap)
        alpha = ch.get_challenge()
        ch.observe_element(alpha)               # draws feed back in
        _, out_arrays = ch.flatten()
        return out_arrays, alpha

    cap = np.arange(8, dtype=np.uint64).reshape(2, 4)
    out_spec = None
    # jit with static output spec: run once traced to learn the spec
    ch2 = DeviceChallenger.unflatten(spec, arrays)
    ch2.observe_cap(gl.from_u64(cap))
    a = ch2.get_challenge()
    ch2.observe_element(a)
    out_spec, _ = ch2.flatten()

    jitted = jax.jit(phase)
    out_arrays, alpha = jitted(arrays, gl.from_u64(cap))
    got = DeviceChallenger.unflatten(out_spec, out_arrays).to_host()

    host.observe_cap(cap)
    h_alpha = host.get_challenge()
    host.observe_element(h_alpha)
    assert int(gl.to_u64(alpha)) == h_alpha
    assert got.state == host.state
    assert got.input_buffer == host.input_buffer
    assert got.output_buffer == host.output_buffer


def test_pending_inputs_preserved_across_boundary():
    host = Challenger()
    host.observe_elements([11, 22])
    dev = DeviceChallenger.from_host(host)
    spec, arrays = dev.flatten()
    back = DeviceChallenger.unflatten(spec, arrays).to_host()
    assert back.state == host.state
    assert back.input_buffer == host.input_buffer
    assert back.output_buffer == host.output_buffer
