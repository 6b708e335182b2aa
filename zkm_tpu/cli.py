"""Command-line drivers, mirroring the reference's env-var example binaries.

Reference analog: prover/examples/{split-seg,prove-seg}/src/main.rs.

Usage:
  python -m zkm_tpu.cli split-seg   ELF_PATH=... SEG_OUTPUT=... [SEG_SIZE=65536] [ARGS="a b"]
  python -m zkm_tpu.cli prove-seg   SEG_FILE=... [DEBUG=1]
  python -m zkm_tpu.cli prove-elf   ELF_PATH=... [SEG_SIZE=...] [ARGS=...]
  python -m zkm_tpu.cli wrap        PROOF_JSON=... OUTPUT_DIR=...
(variables read from the environment, like the reference binaries)
"""

from __future__ import annotations

import os
import sys

from .emulator.state import Segment
from .emulator.utils import load_elf_with_patch, split_prog_into_segs
from .host import prove_elf, prove_segment, verify_segment_receipt
from .stark.config import StarkConfig


def _env(name, default=None, required=False):
    v = os.environ.get(name, default)
    if required and v is None:
        sys.exit(f"missing required env var {name}")
    return v


def cmd_split_seg():
    elf = _env("ELF_PATH", required=True)
    out = _env("SEG_OUTPUT", required=True)
    seg_size = int(_env("SEG_SIZE", "65536"))
    args = (_env("ARGS", "") or "").split()
    state = load_elf_with_patch(elf, args)
    total, segs, _ = split_prog_into_segs(state, out, "", seg_size)
    print(f"split done: {total} steps into {len(segs)} segments at {out}")


def cmd_prove_seg():
    seg_file = _env("SEG_FILE", required=True)
    with open(seg_file) as f:
        seg = Segment.from_json(f.read())
    debug = bool(int(_env("DEBUG", "0")))
    receipt = prove_segment(seg, StarkConfig.standard_fast_config(),
                            debug=debug)
    verify_segment_receipt(receipt)
    print(f"segment {seg.segment_id} proved and verified; "
          f"image id {receipt.image_id.hex()}")


def cmd_prove_elf():
    elf = _env("ELF_PATH", required=True)
    seg_size = int(_env("SEG_SIZE", "65536"))
    args = (_env("ARGS", "") or "").split()
    receipts = prove_elf(elf, args, seg_size=seg_size)
    for r in receipts:
        verify_segment_receipt(r)
    print(f"proved {len(receipts)} segments; final image id "
          f"{receipts[-1].image_id.hex()}")


def cmd_wrap():
    """STARK -> Groth16 wrap of an exported (already verified) proof:
    the as_groth16 / SetupAndGenerateSolVerifier driver analog
    (recursion/src/lib.rs:162-169, libsnark/snark_prover.go:262-309).

    PROOF_JSON=exported proof path; OUTPUT_DIR=where to write
    snark_proof_with_public_inputs.json and verifier.sol."""
    import json as _json

    proof_path = _env("PROOF_JSON", required=True)
    out_dir = _env("OUTPUT_DIR", required=True)
    os.makedirs(out_dir, exist_ok=True)
    with open(proof_path) as f:
        doc = _json.load(f)

    from .snark import wrap as snark_wrap
    from .snark.contract import emit_verifier_sol

    pk = snark_wrap.groth16_setup()
    wrapped = snark_wrap.wrap_stark_bn254(doc, pk)
    proof_out = os.path.join(out_dir, "snark_proof_with_public_inputs.json")
    with open(proof_out, "w") as f:
        f.write(wrapped.to_json())
    sol_out = os.path.join(out_dir, "verifier.sol")
    with open(sol_out, "w") as f:
        f.write(emit_verifier_sol(pk.vk))
    print(f"wrapped: {proof_out} + {sol_out}; "
          f"claim digest (MiMC) {wrapped.public_inputs[0]}")


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    cmd = sys.argv[1].replace("-", "_")
    fn = globals().get(f"cmd_{cmd}")
    if fn is None:
        sys.exit(f"unknown command {sys.argv[1]}\n{__doc__}")
    fn()


if __name__ == "__main__":
    main()
