"""End-to-end FRI test: commit -> open -> prove -> verify (prover on the
device path, verifier on independent host-int arithmetic)."""

import numpy as np
import pytest

from zkm_tpu.field import goldilocks as gl
from zkm_tpu.commit import polynomial_batch as pb
from zkm_tpu.commit.merkle import build_merkle_tree, verify_merkle_proof
from zkm_tpu.fri.config import FriConfig
from zkm_tpu.fri import oracle as fri_oracle
from zkm_tpu.fri.verifier import verify_fri_proof
from zkm_tpu.iop.challenger import Challenger

P = gl.P


def test_merkle_roundtrip(rng):
    leaves = gl.from_u64(rng.integers(0, P, size=(64, 7), dtype=np.uint64))
    tree = build_merkle_tree(leaves, cap_height=2)
    assert tree.cap[0].shape == (4, 4)
    for idx in [0, 13, 63]:
        sibs = tree.open(idx)
        assert verify_merkle_proof(gl.getitem(leaves, idx), idx, sibs, tree.cap)
    # wrong leaf fails
    bad = gl.from_u64(np.arange(7, dtype=np.uint64))
    assert not verify_merkle_proof(bad, 13, tree.open(13), tree.cap)


def test_open_batch_cap_sized_tree(rng):
    """Regression (round-2 P0): a tree with exactly 2^cap_height leaves has
    empty Merkle paths; open_batch crashed on jnp.stack([]).  Every
    min-height table (2^6 rows) hits this in its FRI commit phase under
    standard_fast_config (cap_height=4), so prove_segment under the
    production config was broken (BENCH_r02 crash)."""
    leaves = gl.from_u64(rng.integers(0, P, size=(16, 7), dtype=np.uint64))
    tree = build_merkle_tree(leaves, cap_height=4)
    paths = tree.open_batch([0, 5, 15])
    assert paths == [[], [], []]
    for idx in (0, 5, 15):
        assert verify_merkle_proof(gl.getitem(leaves, idx), idx, [],
                                   tree.cap)
    bad = gl.from_u64(np.arange(7, dtype=np.uint64))
    assert not verify_merkle_proof(bad, 5, [], tree.cap)


def test_polynomial_batch_leaf_consistency(rng):
    values = rng.integers(0, P, size=(3, 32), dtype=np.uint64)
    batch = pb.from_values(gl.from_u64(values), rate_bits=2, cap_height=2)
    # leaf at index i must equal evaluations at g * w^{rev(i)}
    log_m = 7
    w = gl.primitive_root_of_unity(log_m)
    coeffs = gl.to_u64(batch.coeffs)
    for i in [0, 1, 77]:
        rev = int(bin(i)[2:].zfill(log_m)[::-1], 2)
        x = (7 * pow(w, rev, P)) % P
        row = batch.leaf_row(i)
        for c in range(3):
            want = sum(int(cf) * pow(x, k, P)
                       for k, cf in enumerate(coeffs[c])) % P
            assert int(row[c]) == want, (i, c)
    # original values recoverable: p(w_n^j) == values
    wn = gl.primitive_root_of_unity(5)
    got = sum(int(cf) * pow(wn, 3 * 0, P) for cf in [0]) # noop
    j = 3
    x = pow(wn, j, P)
    for c in range(3):
        want = sum(int(cf) * pow(x, k, P) for k, cf in enumerate(coeffs[c])) % P
        assert want == int(values[c][j])


@pytest.mark.parametrize("degree_bits", [6])
def test_fri_end_to_end(rng, degree_bits):
    n = 1 << degree_bits
    config = FriConfig(rate_bits=2, cap_height=2, proof_of_work_bits=8,
                       num_query_rounds=11, arity_bits=2, final_poly_bits=3)
    values_a = rng.integers(0, P, size=(4, n), dtype=np.uint64)
    values_b = rng.integers(0, P, size=(3, n), dtype=np.uint64)
    oa = pb.from_values(gl.from_u64(values_a), config.rate_bits, config.cap_height)
    ob = pb.from_values(gl.from_u64(values_b), config.rate_bits, config.cap_height)
    oracles = [oa, ob]

    chal = Challenger()
    chal.observe_cap(oa.cap_u64())
    chal.observe_cap(ob.cap_u64())
    z = chal.get_extension_challenge()
    gz = ((z[0] * 1) % P, z[1])  # second opening point: z shifted
    g = gl.primitive_root_of_unity(degree_bits)
    gz = ((z[0] * g) % P, (z[1] * g) % P)

    batches = [
        fri_oracle.OpeningBatch(point=z, ranges=(
            fri_oracle.PolyRange(0, 0, 4), fri_oracle.PolyRange(1, 0, 3))),
        fri_oracle.OpeningBatch(point=gz, ranges=(
            fri_oracle.PolyRange(0, 0, 4),)),
    ]
    opens_z = np.concatenate([
        fri_oracle.eval_columns_at(oa.coeffs, z),
        fri_oracle.eval_columns_at(ob.coeffs, z)], axis=0)
    opens_gz = fri_oracle.eval_columns_at(oa.coeffs, gz)
    openings = [opens_z, opens_gz]
    for arr in openings:
        for c0, c1 in arr:
            chal.observe_extension((int(c0), int(c1)))

    # capture alpha for the verifier (drawn inside open_and_prove)
    alpha_probe = chal.clone().get_extension_challenge()
    proof = fri_oracle.open_and_prove(batches, openings, oracles, chal, config)

    # ---- verify ----
    vchal = Challenger()
    vchal.observe_cap(oa.cap_u64())
    vchal.observe_cap(ob.cap_u64())
    vz = vchal.get_extension_challenge()
    assert vz == z
    for arr in openings:
        for c0, c1 in arr:
            vchal.observe_extension((int(c0), int(c1)))
    alpha = vchal.get_extension_challenge()
    assert alpha == alpha_probe
    combine = fri_oracle.make_combine_initial(
        batches, openings, alpha, degree_bits, config)
    verify_fri_proof(proof, combine, [oa.cap_u64(), ob.cap_u64()],
                     degree_bits, vchal, config)

    # ---- tampered proof must fail ----
    bad = proof
    orig = bad.final_poly[0][0]
    bad.final_poly[0][0] = (int(orig) + 1) % P
    vchal2 = Challenger()
    vchal2.observe_cap(oa.cap_u64())
    vchal2.observe_cap(ob.cap_u64())
    vchal2.get_extension_challenge()
    for arr in openings:
        for c0, c1 in arr:
            vchal2.observe_extension((int(c0), int(c1)))
    alpha2 = vchal2.get_extension_challenge()
    combine2 = fri_oracle.make_combine_initial(
        batches, openings, alpha2, degree_bits, config)
    with pytest.raises(ValueError):
        verify_fri_proof(bad, combine2, [oa.cap_u64(), ob.cap_u64()],
                         degree_bits, vchal2, config)
    bad.final_poly[0][0] = orig
