"""Variable-length code packing as a data-parallel device op.

Replaces the reference's bit-by-bit bitvector appends (bit_vector.c:13-122)
with a segmented prefix-sum formulation: given per-slot (code, len) arrays
(len 0 = empty slot), compute each code's bit offset with one cumsum, then
split every code into at-most-two 32-bit-word contributions and combine
them with a scatter-add (bit-disjoint adds == OR).  MSB-first within
big-endian 32-bit words, matching MPEG bit order.

`pack_words` is rank-polymorphic: leading axes are batch (frames, slices),
packing runs along the last axis; XLA batches the scatter.  A fused Pallas
variant can replace the scatter if it shows up in profiles; the interface
(codes, lens) -> (words, nbits) stays.
"""

from __future__ import annotations

import numpy as np


def pack_words(codes, lens, max_words: int, xp=np):
    """Pack (..., K) uint32 codes of given bit lens into (..., W) uint32 words.

    Returns (words, nbits) where nbits (...,) is the total packed bit count
    (unpadded); bits beyond nbits are zero.  Codes must be <= 32 bits and
    masked to their length (zero-length slots may carry any value; they are
    zeroed here).
    """
    codes = xp.where(lens > 0, codes.astype(xp.uint32), xp.uint32(0))
    lens = lens.astype(xp.int32)
    ends = xp.cumsum(lens, axis=-1)
    off = ends - lens  # exclusive prefix sum: bit offset of each code
    nbits = ends[..., -1]

    word = (off >> 5).astype(xp.int32)
    s = (off & 31).astype(xp.int32)
    over = s + lens - 32  # >0: code crosses into the next word

    sh0 = xp.clip(32 - s - lens, 0, 31).astype(xp.uint32)
    w0 = xp.where(
        over > 0,
        codes >> xp.clip(over, 0, 31).astype(xp.uint32),
        codes << sh0,
    )
    sh1 = xp.clip(32 - over, 1, 31).astype(xp.uint32)
    w1 = xp.where(over > 0, codes << sh1, xp.uint32(0))

    if xp is np:
        batch_shape = codes.shape[:-1]
        out = np.zeros(batch_shape + (max_words,), np.uint32)
        flat_out = out.reshape(-1, max_words)
        flat_w = word.reshape(-1, word.shape[-1])
        flat0 = w0.reshape(flat_w.shape)
        flat1 = w1.reshape(flat_w.shape)
        rows = np.repeat(np.arange(flat_w.shape[0]), flat_w.shape[1])
        w_flat = flat_w.reshape(-1)
        v0 = np.where(w_flat < max_words, flat0.reshape(-1), 0)  # drop overflow
        v1 = np.where(w_flat + 1 < max_words, flat1.reshape(-1), 0)
        np.add.at(flat_out, (rows, np.minimum(w_flat, max_words - 1)), v0)
        np.add.at(flat_out, (rows, np.minimum(w_flat + 1, max_words - 1)), v1)
        return out, nbits

    import jax

    # TPU-friendly scatter-free formulation.  Bit offsets are monotonic, so
    # the codes contributing to output word w form a contiguous index range
    # [start[w], start[w+1]); within a word the contributions are
    # bit-disjoint, so their uint32 wrap-sum equals their OR.  That turns
    # packing into two prefix sums + one binary search + gathers — no
    # scatter at all.
    def pack1(word_i, w0_i, w1_i):
        zero = xp.zeros((1,), xp.uint32)
        p0 = xp.concatenate([zero, xp.cumsum(w0_i, dtype=xp.uint32)])
        p1 = xp.concatenate([zero, xp.cumsum(w1_i, dtype=xp.uint32)])
        # start[w] = first code index whose word >= w, for w in 0..W
        starts = xp.searchsorted(word_i, xp.arange(max_words + 1, dtype=word_i.dtype))
        s_prev = xp.concatenate([xp.zeros((1,), starts.dtype), starts[:-1]])
        direct = p0[starts[1:]] - p0[starts[:-1]]
        carry = p1[starts[:-1]] - p1[s_prev[:-1]]
        return direct + carry

    flat = word.reshape(-1, word.shape[-1])
    out = jax.vmap(pack1)(flat, w0.reshape(flat.shape), w1.reshape(flat.shape))
    return out.reshape(codes.shape[:-1] + (max_words,)), nbits


def words_to_bytes(words, xp=np):
    """(..., W) uint32 big-endian words -> (..., W*4) uint8."""
    w = words.astype(xp.uint32)
    b = xp.stack(
        [
            (w >> 24) & 0xFF,
            (w >> 16) & 0xFF,
            (w >> 8) & 0xFF,
            w & 0xFF,
        ],
        axis=-1,
    ).astype(xp.uint8)
    return b.reshape(words.shape[:-1] + (words.shape[-1] * 4,))


def pack_bytes(codes, lens, max_bytes: int, xp=np):
    """Convenience: pack straight to (..., max_bytes) uint8 + bit lengths."""
    assert max_bytes % 4 == 0
    words, nbits = pack_words(codes, lens, max_bytes // 4, xp=xp)
    return words_to_bytes(words, xp=xp), nbits
