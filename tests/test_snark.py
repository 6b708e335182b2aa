"""BN254 / Groth16 / wrap layer tests (reference snark/ parity:
libsnark/snark_prover.go Groth16 over BN254, contract.go verifier.sol).

The full claim-circuit wrap (10 limbs, 91-round MiMC, ~4.6k constraints)
takes ~2 min in pure Python, so the default suite exercises every layer on
small statements; the production-shape wrap runs under ZKM_SLOW=1 and in
the e2e recursion test (test_recursion_wrap.py).
"""

import json

import pytest

from zkm_tpu.snark import bn254 as c
from zkm_tpu.snark import groth16 as g16
from zkm_tpu.snark import mimc
from zkm_tpu.snark.r1cs import R1CS


def test_bn254_group_law():
    assert c.is_on_curve(c.G1, c.B)
    assert c.is_on_curve(c.G2, c.B2)
    assert c.eq(c.add(c.add(c.double(c.G1), c.G1), c.G1),
                c.double(c.double(c.G1)))
    assert c.multiply(c.G1, c.R) is None
    assert c.multiply(c.G2, c.R) is None
    # known 2G (EIP-196 test value)
    two_g = c.double(c.G1)
    assert two_g[0].n == 1368015179489954701390400359078579693043519447331113978918064868415326638035  # noqa: E501


def test_fq2_fq12_inverse():
    x = c.FQ2([9, 1])
    assert (x * x.inv()).coeffs == [1, 0]
    y = c.FQ12(list(range(1, 13)))
    assert y * y.inv() == c.FQ12.one()


def test_pairing_bilinearity():
    p1 = c.pairing(c.G2, c.G1)
    p2 = c.pairing(c.G2, c.multiply(c.G1, 2))
    assert p1 * p1 == p2
    assert p1 != c.FQ12.one()
    assert p1 ** c.R == c.FQ12.one()


def test_pairing_check():
    assert c.pairing_check([(c.G1, c.G2), (c.neg(c.G1), c.G2)])
    assert not c.pairing_check([(c.G1, c.G2), (c.G1, c.G2)])


def test_msm_matches_naive(rng):
    pts = [c.multiply(c.G1, int(rng.integers(1, 2**62))) for _ in range(7)]
    ss = [int(rng.integers(1, 2**62)) for _ in range(7)]
    naive = None
    for p, s in zip(pts, ss):
        naive = c.add(naive, c.multiply(p, s))
    assert c.eq(c.msm(pts, ss), naive)


def test_mimc_host_circuit_agree():
    elems = [12345, 67890, 2**127 + 3]
    d = mimc.hash_elements(elems)
    cs = R1CS()
    d_pub = cs.alloc(d, public=True)
    ws = [cs.alloc(e, public=True) for e in elems]
    out = mimc.hash_elements_circuit(cs, ws)
    cs.assert_eq(out, d_pub)
    assert cs.is_satisfied()
    # corrupt the digest -> unsatisfied
    cs.values[d_pub] = (d + 1) % g16.FR
    assert not cs.is_satisfied()


def _toy_circuit(xval: int):
    """y == x^7 + x + 5 with y public."""
    cs = R1CS()
    yval = (pow(xval, 7, g16.FR) + xval + 5) % g16.FR
    y = cs.alloc(yval, public=True)
    x = cs.alloc(xval)
    x7 = cs.pow7(x)
    out = cs.add_lc([(x7, 1), (x, 1)], const=5)
    cs.assert_eq(out, y)
    return cs, yval


def test_groth16_roundtrip():
    cs, yval = _toy_circuit(1234567)
    pk = g16.setup(cs)
    proof = g16.prove(pk, cs)
    assert g16.verify(pk.vk, [yval], proof)
    # wrong public input rejected
    assert not g16.verify(pk.vk, [(yval + 1) % g16.FR], proof)
    # tampered proof rejected
    bad = g16.Proof(a=c.double(proof.a), b=proof.b, c=proof.c)
    assert not g16.verify(pk.vk, [yval], bad)


def test_groth16_proof_is_circuit_specific():
    """A proof for one witness does not verify under another statement's
    public input, and a pk built for the same-shaped circuit reproves."""
    cs1, y1 = _toy_circuit(111)
    pk = g16.setup(cs1)
    cs2, y2 = _toy_circuit(222)
    proof2 = g16.prove(pk, cs2)     # same circuit shape, new witness
    assert g16.verify(pk.vk, [y2], proof2)
    assert not g16.verify(pk.vk, [y1], proof2)


def test_claim_limb_packing():
    from zkm_tpu.snark.wrap import claim_limbs, CLAIM_LIMBS
    doc = {
        "public_values": {
            "roots_before": [0xDEADBEEF] + [0] * 7,
            "roots_after": list(range(8)),
            "userdata": "ab" * 32,
        },
        "program_cap": None,
        "stark_proofs": [{"degree_bits": 6}],
    }
    limbs = claim_limbs(doc)
    assert len(limbs) == CLAIM_LIMBS
    assert all(0 <= v < (1 << 128) for v in limbs)
    # roots_before big-endian packing: first word lands in the high limb
    assert limbs[1] >> 96 == 0xDEADBEEF
    # proof digest binds the proof bytes
    doc2 = dict(doc, stark_proofs=[{"degree_bits": 7}])
    assert claim_limbs(doc2)[8:] != limbs[8:]
    assert claim_limbs(doc2)[:8] == limbs[:8]


def test_verifier_sol_emission():
    from zkm_tpu.snark.contract import emit_verifier_sol
    cs, yval = _toy_circuit(7)
    pk = g16.setup(cs)
    sol = emit_verifier_sol(pk.vk)
    assert "function verifyProof" in sol
    assert str(pk.vk.alpha_g1[0].n) in sol
    assert str(pk.vk.delta_g2[0].coeffs[1]) in sol   # imag-first EVM order
    assert f"uint256[{len(pk.vk.ic) - 1}] calldata input" in sol
    # one accumulate line per public input
    assert sol.count("ecMulAdd(vkx,") == len(pk.vk.ic) - 1


@pytest.mark.slow
def test_wrap_production_shape():
    from zkm_tpu.snark import wrap
    doc = {
        "public_values": {"roots_before": list(range(8)),
                          "roots_after": list(range(8, 16)),
                          "userdata": "11" * 32},
        "program_cap": [[1, 2, 3, 4]],
        "stark_proofs": [{"degree_bits": 10}],
    }
    pk = wrap.groth16_setup()
    wp = wrap.wrap_stark_bn254(doc, pk)
    assert g16.verify(pk.vk, wp.public_inputs, wp.proof)
    parsed = json.loads(wp.to_json())
    assert len(parsed["public_inputs"]) == 11
    # digest is the MiMC hash of the limbs
    assert int(parsed["public_inputs"][0]) == mimc.hash_elements(
        wrap.claim_limbs(doc))
