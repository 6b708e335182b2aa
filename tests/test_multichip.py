"""Multi-chip sharding: the (dp, tp)-sharded commit/quotient/FRI-fold
steps run on the 8-virtual-device mesh and match the unsharded results
bit-for-bit (a sharded next-row roll or fold regrouping that miscomputes
across shard boundaries would diverge here).
"""

import jax
import numpy as np
import pytest

from zkm_tpu.field import goldilocks as gl
from zkm_tpu.parallel import sharding as sh
from zkm_tpu.tables import logic


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return sh.make_mesh(jax.devices()[:8])


def _traces(s=4, n=64, seed=3):
    rng = np.random.default_rng(seed)
    ops = [[(int(rng.integers(0, 4)), int(rng.integers(0, 1 << 32)),
             int(rng.integers(0, 1 << 32))) for _ in range(20)]
           for _ in range(s)]
    rows = np.stack([logic.generate_rows(o, min_rows=n) for o in ops])
    return gl.from_u64(rows)


def test_sharded_pipeline_matches_unsharded(mesh):
    traces = _traces()
    n = traces[0].shape[-1]
    degree_bits = n.bit_length() - 1

    commit = sh.make_sharded_commit_step(mesh, rate_bits=2, cap_height=2)
    coeffs, _, caps = commit(traces)

    coeffs_ref, _, caps_ref = jax.jit(
        lambda t: sh.commit_step(t, 2, 2))(traces)
    np.testing.assert_array_equal(np.asarray(caps[0]),
                                  np.asarray(caps_ref[0]))

    quotient = sh.make_sharded_quotient_step(
        mesh, logic.LogicStark(), [3, 5], degree_bits)
    q = quotient(coeffs)
    q_ref = jax.jit(lambda c: sh.quotient_step(
        logic.LogicStark(), c, [3, 5], degree_bits))(coeffs_ref)
    np.testing.assert_array_equal(np.asarray(q[0]), np.asarray(q_ref[0]))
    np.testing.assert_array_equal(np.asarray(q[1]), np.asarray(q_ref[1]))

    fold = sh.make_sharded_fri_fold(mesh, beta=7, arity_bits=2)
    f = fold((q[0][:, 0, :], q[1][:, 0, :]))
    f_ref = jax.jit(lambda v: sh.fri_fold_step(v, 7, 2))(
        (q_ref[0][:, 0, :], q_ref[1][:, 0, :]))
    np.testing.assert_array_equal(np.asarray(f[0]), np.asarray(f_ref[0]))
    np.testing.assert_array_equal(np.asarray(f[1]), np.asarray(f_ref[1]))


def test_quotient_vanishes_on_valid_trace(mesh):
    """The alpha-combined vanishing values of a valid Logic trace must be
    divisible by Z_H: equivalently they vanish on H itself.  On the 2n
    coset Z_H has no roots, so instead check on the trace domain by
    evaluating constraints directly (the sharded quotient path reuses the
    same schedule, so agreement + this check pins semantics)."""
    from zkm_tpu.stark.constraint_debug import check_stark_constraints
    traces = _traces(s=1)
    check_stark_constraints(
        logic.LogicStark(), np.asarray(gl.to_u64(
            (traces[0][0], traces[1][0]))))
