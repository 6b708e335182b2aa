"""STARK -> SNARK wrap: the reference's `wrap_stark_bn254` / `as_groth16`
analog (recursion/src/lib.rs:92-169, snark/snarks.rs:7-18), in-repo.

Consumes an exported proof document (zkm_tpu.export.export_proof of the
final aggregation/block proof), packs its claim into BN254 scalar limbs,
and produces a Groth16 proof whose public inputs are the claim limbs plus
their in-circuit MiMC digest — the same public-input-compression role the
reference's plonky2x WrappedCircuit + gnark pipeline plays (public inputs
packed to bit-bounded field elements, recursion/src/lib.rs:119-133, then
hashed inside the wrapper).

DOCUMENTED DEVIATION (docs/cross_verification.md): the reference's gnark
circuit re-verifies the plonky2 block proof inside the SNARK
(gnark-plonky2-verifier); here the STARK chain is verified natively before
wrapping (wrap refuses a proof that fails `verify_proof`), and the SNARK
binds the verified claim + proof commitment to the on-chain digest.  An
in-circuit Goldilocks-STARK verifier over BN254 is out of scope for a
pure-Python R1CS (≈10^8 non-native-field constraints); the R1CS builder
(r1cs.py) is the extension point if one is added.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import List, Optional

from . import bn254 as c
from . import groth16 as g16
from . import mimc
from .r1cs import R1CS

# claim layout: 10 limbs, each < 2^128 (so well inside Fr)
CLAIM_LIMBS = 10
LIMB_LABELS = [
    "roots_before_lo", "roots_before_hi",
    "roots_after_lo", "roots_after_hi",
    "userdata_lo", "userdata_hi",
    "vk_digest_lo", "vk_digest_hi",
    "proof_digest_lo", "proof_digest_hi",
]


def _pack_u32x8(words: List[int]) -> List[int]:
    """8 u32 words -> 2 x 128-bit limbs (big-endian word order)."""
    acc = 0
    for w in words:
        acc = (acc << 32) | (int(w) & 0xFFFFFFFF)
    return [acc >> 128, acc & ((1 << 128) - 1)][::-1]   # [lo, hi]


def _split_bytes32(b: bytes) -> List[int]:
    v = int.from_bytes(b, "big")
    return [v & ((1 << 128) - 1), v >> 128]


def claim_limbs(doc: dict) -> List[int]:
    """Exported proof document -> the 10 claim limbs."""
    pv = doc["public_values"]
    limbs = []
    limbs += _pack_u32x8([int(v) for v in pv["roots_before"]])
    limbs += _pack_u32x8([int(v) for v in pv["roots_after"]])
    limbs += _split_bytes32(bytes.fromhex(pv["userdata"]))
    vk_blob = json.dumps(doc.get("program_cap"), sort_keys=True).encode()
    limbs += _split_bytes32(hashlib.sha256(vk_blob).digest())
    proof_blob = json.dumps(doc["stark_proofs"], sort_keys=True).encode()
    limbs += _split_bytes32(hashlib.sha256(proof_blob).digest())
    assert len(limbs) == CLAIM_LIMBS
    return limbs


def build_wrap_circuit(limbs: List[int]) -> R1CS:
    """Publics: [digest, limb_0..limb_9]; constraint: digest ==
    MiMC-MP(limbs)."""
    digest = mimc.hash_elements(limbs)
    cs = R1CS()
    d_pub = cs.alloc(digest, public=True)
    limb_wires = [cs.alloc(v, public=True) for v in limbs]
    d_computed = mimc.hash_elements_circuit(cs, limb_wires)
    cs.assert_eq(d_computed, d_pub)
    return cs


@dataclass
class WrappedProof:
    proof: g16.Proof
    public_inputs: List[int]       # [digest] + claim limbs
    vk: g16.VerifyingKey

    def to_json(self) -> str:
        """gnark-compatible layout (snark_proof_with_public_inputs.json,
        reference libsnark/snark_prover.go:296-303)."""
        pf = self.proof
        return json.dumps({
            "proof": {
                "a": [str(pf.a[0].n), str(pf.a[1].n)],
                "b": [[str(v) for v in pf.b[0].coeffs],
                      [str(v) for v in pf.b[1].coeffs]],
                "c": [str(pf.c[0].n), str(pf.c[1].n)],
            },
            "public_inputs": [str(v) for v in self.public_inputs],
        })


_PK_CACHE: dict = {}
_PK_VERSION = 1   # bump when the wrap circuit or MiMC constants change


def _pk_path() -> str:
    import os

    from ..recursion.cache import CACHE_DIR
    os.makedirs(CACHE_DIR, exist_ok=True)
    return os.path.join(CACHE_DIR, f"groth16_wrap_pk_v{_PK_VERSION}.pkl")


def groth16_setup(force: bool = False) -> g16.ProvingKey:
    """Build (or reuse) the wrap circuit's proving key.  The circuit shape
    is claim-independent, so one setup serves every wrap; the key persists
    to disk so later processes skip the ~90 s setup (the reference caches
    its R1CS/pk/vk on disk the same way, snark_prover.go:144-259)."""
    import pickle

    if "pk" in _PK_CACHE and not force:
        return _PK_CACHE["pk"]
    path = _pk_path()
    if not force:
        try:
            with open(path, "rb") as f:
                _PK_CACHE["pk"] = pickle.load(f)
            return _PK_CACHE["pk"]
        except (OSError, pickle.UnpicklingError, EOFError):
            pass
    cs = build_wrap_circuit([0] * CLAIM_LIMBS)
    pk = g16.setup(cs)
    _PK_CACHE["pk"] = pk
    try:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(pk, f)
        import os
        os.replace(tmp, path)
    except OSError:
        pass
    return pk


def wrap_stark_bn254(doc: dict,
                     pk: Optional[g16.ProvingKey] = None) -> WrappedProof:
    """Exported (already natively verified) proof document -> Groth16
    wrap.  Callers are expected to run zkm_tpu.stark.verifier.verify_proof
    (or recursion.shrink verification) before exporting; host.py's
    pipeline does."""
    limbs = claim_limbs(doc)
    cs = build_wrap_circuit(limbs)
    assert cs.is_satisfied()
    if pk is None:
        pk = groth16_setup()
    proof = g16.prove(pk, cs)
    publics = cs.values[1:cs.num_public + 1]
    assert g16.verify(pk.vk, publics, proof)
    return WrappedProof(proof=proof, public_inputs=publics, vk=pk.vk)
