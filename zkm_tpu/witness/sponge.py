"""Sponge op logging + bootstrap/exit kernel hash checks.

Reference: /root/reference/prover/src/witness/util.rs:370-741 (sponge
loggers) and cpu/bootstrap_kernel.rs:26-306 / exit_kernel.rs:22-86 (the
page-hash and image-id checks binding the memory image to the proof).

Word-level deviation: every memory read pushed here is one op per u32 word
(the reference pushes one per *byte*, re-reading each word 4x to feed its
byte-level CTL — see tables/poseidon_sponge.py docstring).
"""

from __future__ import annotations

from typing import List, Tuple

from ..hash import poseidon as ps
from ..tables.cpu import columns as cc
from ..tables.memory import SEG_CODE, MemoryOp

PAGE_SIZE = 4096
WORDS_PER_PAGE = PAGE_SIZE // 4
HASH_ADDRESS_BASE = 0x8000_0000
HASH_ADDRESS_END = 0x8102_0000          # root page base address
ROOT_PAGE_INDEX = HASH_ADDRESS_END >> 12
ROOT_HASH_ADDRESS_BASE = 0x8102_1000
REGISTERS_START = 0x8102_0400
RATE_BYTES = ps.RATE_BYTES              # 32
SPONGE_RATE = ps.SPONGE_RATE            # 8


def _enabled(s) -> bool:
    return getattr(s, "sponge_enabled", False)


def _digest_bytes(digest_u64s: List[int]) -> bytes:
    return b"".join(int(x).to_bytes(8, "little") for x in digest_u64s)


def poseidon_sponge_log(s, base_addresses: List[Tuple[int, int, int]],
                        input_bytes: bytes, precomputed=None) -> List[int]:
    """Log one sponge op: word-level memory reads at the current clock,
    one Poseidon permutation input per rate block, and the sponge-table op.
    Returns the 4-limb digest (witness/util.rs:370-468).

    precomputed: optional (inputs (nb, 12) u64, final (12,) u64) chain
    from ps.sponge_chains_u64 — page hashing batches all pages into one
    device dispatch instead of a permute_host per 32-byte block (which
    was 88% of witness wall-clock)."""
    assert len(input_bytes) % 4 == 0, "sponge inputs must be word-aligned"
    ts = s.clock() * cc.NUM_CHANNELS
    nwords = len(input_bytes) // 4
    assert len(base_addresses) == nwords
    for i, (ctx, seg, virt) in enumerate(base_addresses):
        v = int.from_bytes(input_bytes[4 * i:4 * i + 4], "big")
        got = s.mget(ctx, seg, virt)
        assert got == v, (
            f"sponge read mismatch at {virt:#x}: mem {got:#x} != {v:#x}")
        s._push_mem(True, True, ctx, seg, virt, v)

    from .generation import PoseidonSpongeOp
    s.t.poseidon_sponge_ops.append(PoseidonSpongeOp(
        base_address=list(base_addresses), timestamp=ts,
        input=bytes(input_bytes)))

    if precomputed is not None:
        inputs_u64, final_u64 = precomputed
        for b in range(inputs_u64.shape[0]):
            s.t.poseidon_inputs.append(
                ([int(x) for x in inputs_u64[b]], ts))
        return [int(x) for x in final_u64[:ps.DIGEST]]

    blocks = ps.bytes_to_rate_blocks(input_bytes)     # (nb, 8) u32 LE
    state = [0] * ps.SPONGE_WIDTH
    for block in blocks:
        state[:SPONGE_RATE] = [int(x) for x in block]
        s.t.poseidon_inputs.append((list(state), ts))
        state = ps.permute_host(state)
    return state[:ps.DIGEST]


def _sponge_cpu_row(s, base_addresses, input_bytes: bytes, *,
                    bootstrap: bool, precomputed=None) -> bytes:
    """Push the CPU row carrying a sponge op's CTL view; returns the raw
    digest bytes (bootstrap_kernel.rs:134-179 / :277-302)."""
    row = s.new_row()
    if bootstrap:
        row[cc.IS_BOOTSTRAP_KERNEL] = 1
    else:
        row[cc.IS_EXIT_KERNEL] = 1
        row[cc.PROGRAM_COUNTER] = s.pc
        row[cc.NEXT_PROGRAM_COUNTER] = s.next_pc
    row[cc.IS_POSEIDON_SPONGE] = 1

    final_index = (len(input_bytes) // RATE_BYTES) * SPONGE_RATE
    virt = base_addresses[final_index][2] \
        if final_index < len(base_addresses) else 0
    s.push_no_write(row, 0, base_addresses[0][0])   # context
    s.push_no_write(row, 1, base_addresses[0][1])   # segment
    s.push_no_write(row, 2, virt)
    s.push_no_write(row, 3, len(input_bytes))

    digest = poseidon_sponge_log(s, base_addresses, input_bytes,
                                 precomputed=precomputed)
    for i, c in enumerate(cc.HASH_VALUE):
        row[c] = digest[i]
    s.push_row(row)
    return _digest_bytes(digest)


def _page_bytes(s, page_addr: int) -> Tuple[List, bytes]:
    addrs = [(0, SEG_CODE, page_addr + 4 * i) for i in range(WORDS_PER_PAGE)]
    data = b"".join(
        s.mget(0, SEG_CODE, a).to_bytes(4, "big") for (_, _, a) in addrs)
    return addrs, data


def _check_page_hash(s, seg, page_addr: int, update: bool,
                     precomputed=None):
    """Sponge the page's current content; at bootstrap, assert it matches
    the stored (pre-state) hash; at exit, write the new hash into the
    parent hash page (bootstrap_kernel.rs check_memory_page_hash)."""
    addrs, data = _page_bytes(s, page_addr)

    if update and page_addr != HASH_ADDRESS_END:
        # recompute + write the new hash words before hashing the page's
        # parent (sorted page order guarantees parent hashes later)
        if precomputed is not None:
            raw = _digest_bytes([int(x) for x in
                                 precomputed[1][:ps.DIGEST]])
        else:
            digest = ps.poseidon_bytes(data)
            raw = _digest_bytes([int(x) for x in digest])
        hash_addr = HASH_ADDRESS_BASE + ((page_addr >> 12) << 5)
        writes = [(hash_addr + 4 * j,
                   int.from_bytes(raw[4 * j:4 * j + 4], "big"))
                  for j in range(8)]
        _write_words(s, writes, bootstrap=False)

    digest_raw = _sponge_cpu_row(s, addrs, data, bootstrap=not update,
                                 precomputed=precomputed)

    if page_addr == HASH_ADDRESS_END:
        expected = seg.page_hash_root if update else seg.pre_hash_root
        assert digest_raw == expected, \
            f"root page hash mismatch ({'post' if update else 'pre'})"
    elif not update:
        hash_addr = HASH_ADDRESS_BASE + ((page_addr >> 12) << 5)
        expected = b"".join(
            s.mget(0, SEG_CODE, hash_addr + 4 * j).to_bytes(4, "big")
            for j in range(8))
        assert digest_raw == expected, \
            f"page hash mismatch at {page_addr:#x}"


def _write_words(s, addr_vals: List[Tuple[int, int]], *, bootstrap: bool):
    """Memory writes in chunks of 8 GP channels per CPU row."""
    for base in range(0, len(addr_vals), 8):
        row = s.new_row()
        if bootstrap:
            row[cc.IS_BOOTSTRAP_KERNEL] = 1
        else:
            row[cc.IS_EXIT_KERNEL] = 1
            row[cc.PROGRAM_COUNTER] = s.pc
            row[cc.NEXT_PROGRAM_COUNTER] = s.next_pc
        for channel, (addr, val) in enumerate(addr_vals[base:base + 8]):
            s.mem_write_gp(channel, addr, row, val)
        s.push_row(row)


def _check_image_id(s, seg, post: bool):
    """Write the 9 image-id input words and sponge them
    (bootstrap_kernel.rs check_image_id)."""
    root = seg.page_hash_root if post else seg.pre_hash_root
    pc = seg.end_pc if post else seg.pc
    words = [int.from_bytes(root[4 * i:4 * i + 4], "little")
             for i in range(8)]
    words.append(int.from_bytes((pc & 0xFFFFFFFF).to_bytes(4, "little"),
                                "big"))
    addr_vals = [(ROOT_HASH_ADDRESS_BASE + 4 * i, w)
                 for i, w in enumerate(words)]
    _write_words(s, addr_vals, bootstrap=not post)

    addrs = [(0, SEG_CODE, a) for a, _ in addr_vals]
    data = b"".join(w.to_bytes(4, "big") for w in words)
    digest_raw = _sponge_cpu_row(s, addrs, data, bootstrap=not post)
    expected = seg.image_id if post else seg.pre_image_id
    assert digest_raw == expected, \
        f"image id mismatch ({'post' if post else 'pre'})"


def _precompute_sponges(s, pages: List[int]):
    """Batch the page-sponge chains of `pages` (page indices) into one
    device dispatch + one fetch (ps.sponge_chains_u64); returns
    {page_index: (inputs (nb, 12) u64, final (12,) u64)}."""
    if len(pages) < 2:
        return {}
    import numpy as np
    blocks = np.stack([ps.bytes_to_rate_blocks(
        _page_bytes(s, p << 12)[1]) for p in pages])
    inputs, final = ps.sponge_chains_u64(blocks)
    return {p: (inputs[i], final[i]) for i, p in enumerate(pages)}


def bootstrap_hash_checks(s):
    """Page-hash + pre-image-id sponge rows (bootstrap_kernel.rs:63-71).

    The final bootstrap row is the image-id sponge row (no used channels,
    satisfying the bootstrap-terminator constraint)."""
    seg = s.seg
    pages = sorted({a >> 12 for a in s.image})
    # bootstrap performs no writes, so every page chain can precompute
    pre = _precompute_sponges(s, pages)
    for page_addr in pages:
        _check_page_hash(s, seg, page_addr << 12, update=False,
                         precomputed=pre.get(page_addr))
    _check_image_id(s, seg, post=False)


def exit_kernel_checks(s, seg):
    """End-pc pin, register sync, page re-hash, post-image-id
    (exit_kernel.rs:22-86).  The sponge rows (re-hash + image id) are
    gated on the PoseidonSponge table being registered; the end-pc row and
    register sync are unconditional (they need only CPU + Memory)."""
    assert s.pc == seg.end_pc, \
        f"exit pc {s.pc:#x} != segment end pc {seg.end_pc:#x}"

    # end-pc row: channel 0 carries end_pc into the delta_is_exit constraint
    row = s.new_row()
    row[cc.IS_KERNEL_MODE] = 1
    row[cc.PROGRAM_COUNTER] = s.pc
    row[cc.NEXT_PROGRAM_COUNTER] = s.next_pc
    s.reg_write(0, 0, seg.end_pc, row)
    s.push_row(row)

    # sync registers into the root page (exit_kernel.rs:42-75)
    regs = [v & 0xFFFFFFFF for v in s.regs]
    regs[35] = s.pc
    regs[36] = s.next_pc
    addr_vals = [(REGISTERS_START + 4 * i, v) for i, v in enumerate(regs)]
    _write_words(s, addr_vals, bootstrap=False)

    if not _enabled(s):
        return
    # re-hash every image page with post-state content, then post image id.
    # A page's re-hash writes its digest into its PARENT hash page, so a
    # level's contents are final once every child level is done: process
    # level by level (data pages -> level-1 -> level-2 -> root), batching
    # each level's sponge chains into one device dispatch.
    pages = sorted({a >> 12 for a in s.image})
    levels = [
        [p for p in pages if (p << 12) < HASH_ADDRESS_BASE],
        [p for p in pages
         if HASH_ADDRESS_BASE <= (p << 12) < 0x8100_0000],
        [p for p in pages if 0x8100_0000 <= (p << 12) < HASH_ADDRESS_END],
        [p for p in pages if (p << 12) >= HASH_ADDRESS_END],
    ]
    assert sum(len(lv) for lv in levels) == len(pages)
    for level in levels:
        pre = _precompute_sponges(s, level)
        for page_addr in level:
            _check_page_hash(s, seg, page_addr << 12, update=True,
                             precomputed=pre.get(page_addr))
    _check_image_id(s, seg, post=True)


# -- syscall sponge loggers --------------------------------------------------

def keccak_sponge_log(s, base_addresses: List[Tuple[int, int, int]],
                      input_bytes: bytes):
    """Log one keccak sponge op: word-level memory reads, per-block XOR
    logic ops + keccak-f permutation inputs, and the sponge-table op
    (witness/util.rs keccak_sponge_log:471-557).  Gated on the Keccak
    tables being registered (s.keccak_enabled) so the memory-op stream
    stays CTL-balanced for smaller table subsets."""
    if not getattr(s, "keccak_enabled", False):
        return
    import numpy as np

    from ..hash.keccak import keccak_f
    from ..tables import keccak_sponge as ks
    from ..tables import logic as logic_mod
    assert len(input_bytes) % 4 == 0, "keccak inputs must be word-aligned"
    ts = s.clock() * cc.NUM_CHANNELS
    nwords = len(input_bytes) // 4
    assert len(base_addresses) == nwords
    for i, (ctx, seg, virt) in enumerate(base_addresses):
        v = int.from_bytes(input_bytes[4 * i:4 * i + 4], "big")
        got = s.mget(ctx, seg, virt)
        assert got == v, (
            f"keccak read mismatch at {virt:#x}: mem {got:#x} != {v:#x}")
        s._push_mem(True, True, ctx, seg, virt, v)

    # absorb loop: pad10*1, XOR via logic ops, permute via keccak table
    nb = len(input_bytes) // ks.RATE_BYTES + 1
    flen = len(input_bytes) - (nb - 1) * ks.RATE_BYTES
    state = [0] * ks.WIDTH_U32S
    for b in range(nb):
        if b == nb - 1:
            bb = np.zeros(ks.RATE_BYTES, dtype=np.uint64)
            bb[:flen] = list(input_bytes[b * ks.RATE_BYTES:])
            bb += ks.pad_pattern(flen)
            block = [int(x) for x in bb]
        else:
            block = list(input_bytes[b * ks.RATE_BYTES:
                                     (b + 1) * ks.RATE_BYTES])
        block_u32s = [sum(block[4 * w + j] << (8 * j) for j in range(4))
                      for w in range(ks.RATE_U32S)]
        for w in range(ks.RATE_U32S):
            s.t.logic_ops.append(
                (logic_mod.OP_XOR, state[w], block_u32s[w]))
        xored = [state[w] ^ block_u32s[w] for w in range(ks.RATE_U32S)]
        u32s = xored + state[ks.RATE_U32S:]
        lanes = [u32s[2 * j] | (u32s[2 * j + 1] << 32) for j in range(25)]
        s.t.keccak_inputs.append((lanes, ts))
        out = keccak_f(lanes)
        state = []
        for v in out:
            state += [v & 0xFFFFFFFF, v >> 32]

    from .generation import KeccakSpongeOp
    s.t.keccak_sponge_ops.append(KeccakSpongeOp(
        base_address=list(base_addresses), timestamp=ts,
        input=bytes(input_bytes)))


def sha_extend_sponge_log(s, input_addrs, input_vals, out_addr, round_i):
    """Log one extend step: 4 input word reads + the w[i] read-back at the
    sponge timestamp, and the ShaExtend/ShaExtendSponge op.  Gated on the
    SHA tables being registered (s.sha_enabled)."""
    if not getattr(s, "sha_enabled", False):
        return
    from ..tables.sha_extend import extend_step
    ts = s.clock() * cc.NUM_CHANNELS
    for addr, val in zip(input_addrs, input_vals):
        assert s.mget(0, SEG_CODE, addr) == val
        s._push_mem(True, True, 0, SEG_CODE, addr, val)
    w_i = extend_step(*input_vals)
    assert s.mget(0, SEG_CODE, out_addr) == w_i, "extend write mismatch"
    s._push_mem(True, True, 0, SEG_CODE, out_addr, w_i)

    from .generation import ShaExtendOp
    s.t.sha_extend_ops.append(ShaExtendOp(
        context=0, segment=SEG_CODE, virt_out=out_addr, timestamp=ts,
        inputs=list(input_vals), output=w_i))


def sha_compress_sponge_log(s, hx_vals, h_ptr, w_vals, w_ptr, state_vals):
    """Log one compress block: 8 hx reads + 64 w reads at the sponge
    timestamp (the w reads balance the ShaCompress table's per-round
    memory CTL), 8 digest read-backs at ts+19 (after the CPU write row at
    ts+10), and the ShaCompress/ShaCompressSponge op."""
    if not getattr(s, "sha_enabled", False):
        return
    from ..tables.sha_compress_sponge import M32, OUT_TS_OFFSET
    ts = s.clock() * cc.NUM_CHANNELS
    for i, val in enumerate(hx_vals):
        assert s.mget(0, SEG_CODE, h_ptr + 4 * i) == val
        s._push_mem(True, True, 0, SEG_CODE, h_ptr + 4 * i, val)
    for i, val in enumerate(w_vals):
        assert s.mget(0, SEG_CODE, w_ptr + 4 * i) == val
        s._push_mem(True, True, 0, SEG_CODE, w_ptr + 4 * i, val)
    final = state_vals[-1]
    for i in range(8):
        out = (hx_vals[i] + final[i]) & M32
        s.t.memory_ops.append(MemoryOp(
            True, ts + OUT_TS_OFFSET, True, 0, SEG_CODE, h_ptr + 4 * i,
            out))

    from .generation import ShaCompressOp
    s.t.sha_compress_ops.append(ShaCompressOp(
        context=0, segment=SEG_CODE, h_virt=h_ptr, w_virt_base=w_ptr,
        timestamp=ts, hx=list(hx_vals), w=list(w_vals),
        final=list(final)))
