"""Sponge op logging: poseidon/keccak/sha sponge tables + byte-read memory ops.

Reference: /root/reference/prover/src/witness/util.rs:370-741 (the
poseidon/keccak/sha_extend/sha_compress sponge loggers) and
cpu/bootstrap_kernel.rs / exit_kernel.rs (page-hash + image-id checks).

Round-2 staging: the loggers are no-ops until the corresponding sponge
tables are registered (s.sponge_enabled) — the CPU rows and the raw
memory/logic ops they would balance are still generated, so enabling a
sponge table later only requires flipping the flag.
"""

from __future__ import annotations

from typing import List, Tuple


def _enabled(s) -> bool:
    return getattr(s, "sponge_enabled", False)


def poseidon_sponge_log(s, base_addresses, input_bytes: bytes):
    if not _enabled(s):
        return
    raise NotImplementedError("PoseidonSponge table lands in milestone 4")


def keccak_sponge_log(s, base_addresses, input_bytes: bytes):
    if not _enabled(s):
        return
    raise NotImplementedError("KeccakSponge table lands in milestone 5")


def sha_extend_sponge_log(s, input_addrs, input_vals, out_addr, round_i):
    if not _enabled(s):
        return
    raise NotImplementedError("ShaExtendSponge table lands in milestone 5")


def sha_compress_sponge_log(s, hx_vals, h_ptr, w_vals, w_ptr, state_vals):
    if not _enabled(s):
        return
    raise NotImplementedError("ShaCompressSponge table lands in milestone 5")


def bootstrap_hash_checks(s):
    """Page-hash + pre-image-id poseidon sponge rows (bootstrap_kernel.rs)."""
    raise NotImplementedError("lands with the PoseidonSponge table")


def exit_kernel_checks(s, seg):
    """Register sync + post page-hash/image-id rows (exit_kernel.rs)."""
    raise NotImplementedError("lands with the PoseidonSponge table")
