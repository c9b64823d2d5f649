"""Pallas TPU kernel for variable-length bit packing.

The signature kernel of this framework (SURVEY.md §7 "the hard parts"):
concatenate millions of (codeword, bitlen) pairs into per-slice MPEG bit
streams.  XLA formulations bottom out in scatters or large-array gathers,
both of which serialize on TPU (~9 ns/element measured); this kernel
instead exploits two structural facts:

  * bit offsets are monotone, so the codes of a 128-code chunk land in a
    window of at most ceil(128*32/32)+2 = 130 consecutive output words;
  * contributions to one output word are bit-disjoint, so summing equals
    OR-ing, and per-16-bit-half sums fit exactly in f32.

Each chunk becomes a tiny one-hot matmul on the MXU — (window-local words
x 128 codes) against the codes' 16-bit halves — accumulated into the
output at a dynamic sublane offset.  No gathers, no scatters, no
data-dependent shapes anywhere.

Layout notes (these are what make it fit VMEM and compile):
  * the half-word planes ride as (4, K) — planes on sublanes — because a
    (K, 4) block pads its lane dimension 4 -> 128 (32x VMEM, OOM);
  * the accumulator is (W, 2): dynamic offsets land on the cheap sublane
    dimension;
  * matmuls run at Precision.HIGHEST — the default MXU f32 path rounds
    through bf16 and corrupts half-words wider than 8 mantissa bits
    (observed on hardware);
  * the chunk loop lives inside the kernel (a second grid dimension with
    a revisited output block hangs the Mosaic compiler).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128          # codes per chunk
WINDOW = 192         # output-word window per chunk; covers <= 32-bit codes


def _prep(codes, lens, bit_offset: int = 0):
    """Elementwise prep: per-code word index + the two word contributions.

    bit_offset starts the stream that many bits into the buffer (room for
    a fixed header ORed in afterwards); nbits includes it."""
    codes = jnp.where(lens > 0, codes.astype(jnp.uint32), jnp.uint32(0))
    lens = lens.astype(jnp.int32)
    ends = jnp.cumsum(lens, axis=-1) + bit_offset
    off = ends - lens
    word = (off >> 5).astype(jnp.int32)
    s = (off & 31).astype(jnp.int32)
    over = s + lens - 32
    sh0 = jnp.clip(32 - s - lens, 0, 31).astype(jnp.uint32)
    w0 = jnp.where(over > 0, codes >> jnp.clip(over, 0, 31).astype(jnp.uint32), codes << sh0)
    sh1 = jnp.clip(32 - over, 1, 31).astype(jnp.uint32)
    w1 = jnp.where(over > 0, codes << sh1, jnp.uint32(0))
    return word, w0, w1, ends[..., -1]


def _pack_kernel(word_ref, v_ref, wstart_ref, out_ref):
    """One slice per grid step; chunk loop inside.

    word_ref:   (1, 1, K) int32 — sorted output-word index per code
    v_ref:      (1, 4, K) f32  — [w0_lo, w0_hi, w1_lo, w1_hi] halves
    wstart_ref: (1, 1, nch) int32 (SMEM) — clamped window start per chunk
    out_ref:    (1, W, 2) f32 — accumulated halves
    """
    nch = v_ref.shape[2] // CHUNK
    out_ref[...] = jnp.zeros_like(out_ref)

    def chunk_body(c, _):
        wlo = wstart_ref[0, 0, c]
        lw = word_ref[0, 0, pl.ds(c * CHUNK, CHUNK)] - wlo    # (CHUNK,)
        vals = v_ref[0, :, pl.ds(c * CHUNK, CHUNK)]           # (4, CHUNK)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, CHUNK), 0)
        oh0 = (lw[None, :] == lanes).astype(jnp.float32)      # (WINDOW, CHUNK)
        oh1 = (lw[None, :] + 1 == lanes).astype(jnp.float32)  # carry: word+1
        direct = jax.lax.dot_general(
            oh0, vals[0:2, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                     # (WINDOW, 2)
        carry = jax.lax.dot_general(
            oh1, vals[2:4, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cur = out_ref[0, pl.ds(wlo, WINDOW), :]
        out_ref[0, pl.ds(wlo, WINDOW), :] = cur + direct + carry
        return 0

    jax.lax.fori_loop(0, nch, chunk_body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("max_words", "bit_offset"))
def pack_words_pallas(codes, lens, max_words: int, bit_offset: int = 0):
    """(..., K) codes/lens -> ((..., max_words) uint32 big-endian words,
    (...,) total bit counts).  TPU-only; validated against ops.bitpack."""
    assert max_words >= WINDOW, "output buffer smaller than one window"
    *batch, k = codes.shape
    word, w0, w1, nbits = _prep(codes, lens, bit_offset)

    pad = (-k) % CHUNK
    if pad:
        word = jnp.concatenate(
            [word, jnp.repeat(word[..., -1:], pad, axis=-1)], axis=-1
        )
        zeros = jnp.zeros(tuple(batch) + (pad,), jnp.uint32)
        w0 = jnp.concatenate([w0, zeros], axis=-1)
        w1 = jnp.concatenate([w1, zeros], axis=-1)
    kp = k + pad

    # Window starts, clamped so the dynamic (WINDOW, 2) slice stays in
    # bounds; locals stay < WINDOW by construction.  Overflow codes (word
    # beyond the buffer) get their contributions zeroed — same drop
    # semantics as ops.bitpack.
    wstart = jnp.minimum(word[..., ::CHUNK], max_words - WINDOW).astype(jnp.int32)
    in_range = word < max_words
    w0 = jnp.where(in_range, w0, jnp.uint32(0))
    w1 = jnp.where(in_range, w1, jnp.uint32(0))
    word = jnp.minimum(word, max_words - 1)

    halves = jnp.stack(
        [
            (w0 & 0xFFFF).astype(jnp.float32),
            (w0 >> 16).astype(jnp.float32),
            (w1 & 0xFFFF).astype(jnp.float32),
            (w1 >> 16).astype(jnp.float32),
        ],
        axis=-2,
    )  # (..., 4, K)

    nch = kp // CHUNK
    flat_word = word.reshape(-1, 1, kp).astype(jnp.int32)
    flat_halves = halves.reshape(-1, 4, kp)
    flat_wstart = wstart.reshape(-1, 1, nch)
    n = flat_word.shape[0]

    out = pl.pallas_call(
        _pack_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nch), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, max_words, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, max_words, 2), jnp.float32),
    )(flat_word, flat_halves, flat_wstart)

    lo = out[..., 0].astype(jnp.uint32)
    hi = out[..., 1].astype(jnp.uint32)
    words = ((hi << 16) | lo).reshape(tuple(batch) + (max_words,))
    return words, nbits


def pack_bytes_pallas(codes, lens, max_bytes: int):
    from ec504_imageencoder_tpu.ops.bitpack import words_to_bytes

    assert max_bytes % 4 == 0
    words, nbits = pack_words_pallas(codes, lens, max_bytes // 4)
    return words_to_bytes(words, xp=jnp), nbits


# ---------------------------------------------------------------------------
# v2: transposed-matmul windowed pack.
#
# The v1 kernel's matmuls run as (WINDOW, CHUNK) @ (CHUNK, 2) — M=192 rows
# through the MXU per chunk, twice, for an N of 2: ~384 MXU row-cycles per
# 128 codes.  v2 flips the orientation and drops the second one-hot:
#
#   * vals ride M as 8 bf16 byte planes (exact: bytes <= 255), the window
#     rides N: (8, CHUNK) @ (CHUNK, WINDOW) costs ~8 row-cycles per chunk.
#   * carry contributions (the bits a code spills into word+1) accumulate
#     at the SAME window position as planes 4..7 and the final combine
#     shifts them one word — no second one-hot, no second matmul.
#
# Per-word byte-plane sums stay exact in f32: <= 16 codes can touch one
# word (min code length 2 bits), so sums are < 16*255 << 2^24.


def _pack2_kernel(word_ref, v_ref, wstart_ref, out_ref, *, chunk: int):
    nch = v_ref.shape[2] // chunk
    out_ref[...] = jnp.zeros_like(out_ref)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)

    def chunk_body(c, _):
        wlo = wstart_ref[0, 0, c]
        lw = word_ref[0, 0, pl.ds(c * chunk, chunk)] - wlo      # (chunk,)
        vals = v_ref[0, :, pl.ds(c * chunk, chunk)]             # (8, chunk)
        oh = (lw[:, None] == lanes).astype(jnp.bfloat16)        # (chunk, WINDOW)
        win = jax.lax.dot_general(
            vals.astype(jnp.bfloat16), oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # (8, WINDOW)
        cur = out_ref[0, pl.ds(wlo, chunk), :]
        out_ref[0, pl.ds(wlo, chunk), :] = cur + win.T
        return 0

    jax.lax.fori_loop(0, nch, chunk_body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("max_words", "chunk", "bit_offset"))
def pack_words_pallas2(codes, lens, max_words: int, chunk: int = 256,
                       bit_offset: int = 0):
    """(..., K) codes/lens -> ((..., max_words) uint32 big-endian words,
    (...,) total bit counts).  WINDOW == chunk: within a chunk the bit
    offset advances < chunk*32 bits, so rebased word indices stay in
    [0, chunk)."""
    assert max_words >= chunk
    *batch, k = codes.shape
    word, w0, w1, nbits = _prep(codes, lens, bit_offset)

    pad = (-k) % chunk
    if pad:
        word = jnp.concatenate(
            [word, jnp.repeat(word[..., -1:], pad, axis=-1)], axis=-1
        )
        zeros = jnp.zeros(tuple(batch) + (pad,), jnp.uint32)
        w0 = jnp.concatenate([w0, zeros], axis=-1)
        w1 = jnp.concatenate([w1, zeros], axis=-1)
    kp = k + pad

    wstart = jnp.minimum(word[..., ::chunk], max_words - chunk).astype(jnp.int32)
    in_range = word < max_words
    w0 = jnp.where(in_range, w0, jnp.uint32(0))
    w1 = jnp.where(in_range, w1, jnp.uint32(0))
    word = jnp.minimum(word, max_words - 1)

    planes = jnp.stack(
        [((v >> (8 * i)) & 0xFF).astype(jnp.float32) for v in (w0, w1) for i in range(4)],
        axis=-2,
    )  # (..., 8, K)

    nch = kp // chunk
    flat_word = word.reshape(-1, 1, kp).astype(jnp.int32)
    flat_planes = planes.reshape(-1, 8, kp)
    flat_wstart = wstart.reshape(-1, 1, nch)
    n = flat_word.shape[0]

    out = pl.pallas_call(
        functools.partial(_pack2_kernel, chunk=chunk),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nch), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, max_words, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, max_words, 8), jnp.float32),
    )(flat_word, flat_planes, flat_wstart)

    b = out.astype(jnp.uint32)
    direct = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    carry = b[..., 4] | (b[..., 5] << 8) | (b[..., 6] << 16) | (b[..., 7] << 24)
    carry = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.uint32), carry[:, :-1]], axis=-1
    )
    words = (direct + carry).reshape(tuple(batch) + (max_words,))
    return words, nbits


# ---------------------------------------------------------------------------
# v3: two-level pack — windowed kernel WITHOUT in-loop read-modify-write.
#
# v2 measured ~600 ns/chunk: the per-chunk (8, W).T relayout and the
# dynamic-offset accumulate dominate everything.  v3's kernel emits each
# chunk's window verbatim (store only, native layout); placing windows
# into the word buffer happens OUTSIDE the kernel as a per-slice
# tile-level one-hot matmul (tiny M=32), which also absorbs overlapping
# windows by summation (byte-plane sums stay bit-disjoint and < 2^12, so
# a HIGHEST-precision f32 contraction is exact).
#
# Window starts are aligned down to 128-word tiles so level 2 is a pure
# tile shift: window word j of chunk c lands at 128*tile_c + j, i.e.
# out_tile[T] += sum_c [tile_c == T - a] win[c, 128a + j'].


def _pack3_kernel(word_ref, v_ref, tbase_ref, out_ref, *, chunk: int,
                  window: int, group: int):
    """One (slice, chunk-group) per grid step: pure streaming, no dynamic
    slicing inside the kernel (lane-dim dynamic slices relayout, ~450
    cycles/chunk measured on the fori_loop formulation).  `group` chunks
    are processed per step with a static loop to amortize the ~300 ns
    per-grid-step overhead."""
    c = pl.program_id(1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (chunk, window), 1)
    for g in range(group):
        lw = word_ref[0, g, 0, :] - tbase_ref[0, 0, c * group + g] * 128
        vals = v_ref[0, g, :, :]                                # (8, chunk)
        oh = (lw[:, None] == lanes).astype(jnp.bfloat16)        # (chunk, window)
        out_ref[0, g, :, :] = jax.lax.dot_general(
            vals.astype(jnp.bfloat16), oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # (8, window)


@functools.partial(jax.jit, static_argnames=("max_words", "chunk", "group",
                                               "bit_offset"))
def pack_words_pallas3(codes, lens, max_words: int, chunk: int = 256,
                       group: int = 8, bit_offset: int = 0):
    """Two-level Pallas pack; same contract as pack_words."""
    assert max_words % 128 == 0 and max_words >= chunk + 128
    window = chunk + 128  # chunk spans <= chunk words + 127 alignment slack
    *batch, k = codes.shape
    word, w0, w1, nbits = _prep(codes, lens, bit_offset)

    pad = (-k) % (chunk * group)
    if pad:
        word = jnp.concatenate(
            [word, jnp.repeat(word[..., -1:], pad, axis=-1)], axis=-1
        )
        zeros = jnp.zeros(tuple(batch) + (pad,), jnp.uint32)
        w0 = jnp.concatenate([w0, zeros], axis=-1)
        w1 = jnp.concatenate([w1, zeros], axis=-1)
    kp = k + pad
    nch = kp // chunk

    in_range = word < max_words
    w0 = jnp.where(in_range, w0, jnp.uint32(0))
    w1 = jnp.where(in_range, w1, jnp.uint32(0))
    word = jnp.minimum(word, max_words - 1)
    tile = (word[..., ::chunk] >> 7).astype(jnp.int32)          # (..., nch)

    planes = jnp.stack(
        [((v >> (8 * i)) & 0xFF).astype(jnp.float32) for v in (w0, w1) for i in range(4)],
        axis=-2,
    )  # (..., 8, K)

    n = int(np.prod(batch)) if batch else 1
    flat_word = word.reshape(n, nch, 1, chunk).astype(jnp.int32)
    # (n, 8, K) -> (n, nch, 8, chunk): chunks on a leading block dim so the
    # kernel never slices the lane dimension dynamically
    flat_planes = planes.reshape(n, 8, nch, chunk).transpose(0, 2, 1, 3)
    flat_tile = tile.reshape(n, 1, nch)

    ng = nch // group
    win = pl.pallas_call(
        functools.partial(_pack3_kernel, chunk=chunk, window=window, group=group),
        grid=(n, ng),
        in_specs=[
            pl.BlockSpec((1, group, 1, chunk), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, 8, chunk), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nch), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, group, 8, window), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, nch, 8, window), jnp.float32),
    )(flat_word, flat_planes, flat_tile)

    # Level 2: place windows at their tiles.  res[T] = sum_c 1[tile_c == T-a]
    # win[c, :, 128a:128a+128], realized as one one-hot contraction over c
    # followed by static tile shifts.
    nt = max_words // 128
    na = window // 128
    oh_t = (
        flat_tile.reshape(n, nch)[:, :, None]
        == jnp.arange(nt, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)                                       # (n, nch, NT)
    res = jax.lax.dot_general(
        oh_t, win, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                           # (n, NT, 8, window)
    res = res.reshape(n, nt, 8, na, 128)
    acc = jnp.zeros((n, nt + na, 8, 128), jnp.float32)
    for a in range(na):
        acc = acc.at[:, a : a + nt].add(res[:, :, :, a, :])
    acc = acc[:, :nt]                                           # (n, NT, 8, 128)

    b = acc.astype(jnp.uint32)
    hw = b.transpose(0, 1, 3, 2).reshape(n, max_words, 8)       # (n, W, 8)
    direct = hw[..., 0] | (hw[..., 1] << 8) | (hw[..., 2] << 16) | (hw[..., 3] << 24)
    carry = hw[..., 4] | (hw[..., 5] << 8) | (hw[..., 6] << 16) | (hw[..., 7] << 24)
    carry = jnp.concatenate([jnp.zeros((n, 1), jnp.uint32), carry[:, :-1]], axis=-1)
    words = (direct + carry).reshape(tuple(batch) + (max_words,))
    return words, nbits


# ---------------------------------------------------------------------------
# v4 (production: pack_words_fused): fully fused single-level pack.
#
# Profiling v3 at the 12.8M-code 1080p batch showed the matmul was never
# the bottleneck: ~3.5 ms built the 8 f32 byte planes in XLA (413 MB
# materialized + relayout), ~4 ms was the kernel's input streaming floor,
# ~6 ms the in-kernel one-hot build, ~1 ms the level-2 placement.  This
# version attacks all four:
#
#   * the kernel consumes (codes, ends, lens) directly — pure reshapes,
#     3x51 MB of HBM traffic instead of 464 MB; word indices, the two
#     word contributions, and their byte planes are computed in-kernel
#     (~30 VPU ops/slot, negligible);
#   * one-hot factorization: [lw == j] = [lw>>7 == j>>7]·[lw&127 == j&127]
#     cuts comparisons per slot from `window` (384) to 128 + ntile and
#     MXU work by ~3x;
#   * 512-slot superchunks with window 640 make worst-case spans (every
#     slot 32 bits -> 512 words) fit with NO data-dependent fallback;
#   * output accumulates across grid steps into a VMEM-resident
#     (8, max_words) block (standard revisited-output pattern), so the
#     per-chunk window buffer and its HBM round trip disappear.
#
# Exactness: per-word byte-plane sums are bit-disjoint and <= 16*255, so
# bf16 one-hot x byte-plane matmuls with f32 accumulation are exact.


def _fused_kernel(codes_ref, ends_ref, lens_ref, tbase_ref, out_ref, *,
                  S: int, ntile: int, group: int, max_words: int):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (ntile, 1, S), 0)

    for g in range(group):
        codes = codes_ref[0, g, 0, :]
        ends = ends_ref[0, g, 0, :]
        lens = lens_ref[0, g, 0, :]
        tb = tbase_ref[0, 0, c * group + g] * 128

        off = ends - lens
        word = off >> 5  # off is nonnegative i32
        in_range = word < max_words
        lw = jnp.where(in_range, word, max_words - 1) - tb
        s = off & 31
        over = s + lens - 32
        cu = codes.astype(jnp.uint32)
        w0 = jnp.where(
            over > 0,
            jax.lax.shift_right_logical(cu, jnp.clip(over, 0, 31).astype(jnp.uint32)),
            jax.lax.shift_left(cu, jnp.clip(32 - s - lens, 0, 31).astype(jnp.uint32)),
        )
        w1 = jnp.where(
            over > 0,
            jax.lax.shift_left(cu, jnp.clip(32 - over, 1, 31).astype(jnp.uint32)),
            jnp.uint32(0),
        )
        w0 = jnp.where(in_range, w0, jnp.uint32(0))
        w1 = jnp.where(in_range, w1, jnp.uint32(0))

        planes = [
            jax.lax.shift_right_logical(v, jnp.uint32(8 * i)) & jnp.uint32(0xFF)
            for v in (w0, w1) for i in range(4)
        ]
        vals = jnp.stack(
            [p.astype(jnp.int32).astype(jnp.bfloat16) for p in planes], axis=0
        )  # (8, S); u32->bf16 unsupported in Mosaic, route via i32

        hi = lw >> 7
        lo = lw & 127
        oh_hi = (jax.lax.broadcast_in_dim(hi, (ntile, 1, S), (2,)) == hi_iota
                 ).astype(jnp.bfloat16)
        vh = (jax.lax.broadcast_in_dim(vals, (ntile, 8, S), (1, 2)) * oh_hi
              ).reshape(ntile * 8, S)
        oh_lo = (jax.lax.broadcast_in_dim(lo, (S, 128), (0,)) == lanes
                 ).astype(jnp.bfloat16)
        win = jax.lax.dot_general(
            vh, oh_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ntile, 8, 128)

        idx = pl.multiple_of(tb, 128)
        for h in range(ntile):
            cur = out_ref[0, :, pl.ds(idx + h * 128, 128)]
            out_ref[0, :, pl.ds(idx + h * 128, 128)] = cur + win[h]


@functools.partial(jax.jit, static_argnames=("max_words", "S", "group",
                                               "bit_offset"))
def pack_words_fused(codes, lens, max_words: int, S: int = 512, group: int = 16,
                     bit_offset: int = 0):
    """Same contract as pack_words; the production TPU pack kernel.

    Negative result worth recording: fusing the bit-offset cumsum into the
    kernel as a per-superchunk (1,S)x(S,S) strict-triangular MXU matmul
    with an SMEM carry was ~5 ms SLOWER than the XLA cumsum it replaced —
    the (S,S) weight reload streams S rows through the MXU per superchunk,
    dwarfing the saved memory passes.  The XLA cumsum stays outside."""
    window = S + 128
    ntile = window // 128
    assert max_words % 128 == 0 and max_words >= window
    *batch, k = codes.shape
    codes = jnp.where(lens > 0, codes.astype(jnp.uint32), jnp.uint32(0))
    lens = lens.astype(jnp.int32)
    ends = jnp.cumsum(lens, axis=-1) + bit_offset
    nbits = ends[..., -1]

    pad = (-k) % (S * group)
    if pad:
        zeros = jnp.zeros(tuple(batch) + (pad,), jnp.int32)
        codes = jnp.concatenate([codes, zeros.astype(jnp.uint32)], axis=-1)
        lens = jnp.concatenate([lens, zeros], axis=-1)
        ends = jnp.concatenate(
            [ends, jnp.repeat(ends[..., -1:], pad, axis=-1)], axis=-1
        )
    kp = k + pad
    nsc = kp // S

    first_word = (ends[..., ::S] - lens[..., ::S]) >> 5
    tile = jnp.minimum(
        jnp.minimum(first_word, max_words - 1) >> 7, (max_words - window) // 128
    ).astype(jnp.int32)

    n = int(np.prod(batch)) if batch else 1
    flat_codes = codes.reshape(n, nsc, 1, S).astype(jnp.int32)
    flat_ends = ends.reshape(n, nsc, 1, S).astype(jnp.int32)
    flat_lens = lens.reshape(n, nsc, 1, S)
    flat_tile = tile.reshape(n, 1, nsc)

    ng = nsc // group
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, S=S, ntile=ntile, group=group, max_words=max_words
        ),
        grid=(n, ng),
        in_specs=[
            pl.BlockSpec((1, group, 1, S), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, 1, S), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, 1, S), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nsc), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, max_words), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 8, max_words), jnp.float32),
    )(flat_codes, flat_ends, flat_lens, flat_tile)

    b = out.astype(jnp.uint32)
    direct = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    carry = b[:, 4] | (b[:, 5] << 8) | (b[:, 6] << 16) | (b[:, 7] << 24)
    carry = jnp.concatenate([jnp.zeros((n, 1), jnp.uint32), carry[:, :-1]], axis=-1)
    words = (direct + carry).reshape(tuple(batch) + (max_words,))
    return words, nbits


# ---------------------------------------------------------------------------
# v5 (pack_words_fused4): 4:1 slot fusion ahead of the fused kernel.
#
# v4's cost floor is one MXU cycle per SLOT (the lo one-hot streams one
# column per slot through the (ntile*8, S) x (S, 128) contraction), so the
# remaining lever is slot count.  Adjacent (code, len) pairs fuse exactly:
# (c1, l1) + (c2, l2) -> (c1*2^l2 | c2, l1+l2).  Two fusion levels take
# 65 slots/block to ~17 with NO data-dependent fallback: lens <= 32 fuse
# to <= 64-bit (2-word) values, those fuse to <= 128-bit (4-word) values.
# A fused slot spans <= 5 output words, so the kernel emits 20 byte
# planes (M = ntile*20 = 100 <= 128 — M rides free on the MXU) and the
# final combine shifts plane-group j by j words.  Net: ~4x fewer MXU
# columns for ~2.5x more VPU prep on 4x fewer slots.
#
# Exactness: >= 32 fused slots can't start in one word (each nonempty one
# covers >= 1 bit), so per-word byte-plane sums are <= 32*255 << 2^24.


def _pairs(a, xp):
    """(..., 2K) -> ((..., K) even elements, (..., K) odd elements)."""
    r = a.reshape(a.shape[:-1] + (-1, 2))
    return r[..., 0], r[..., 1]


def _fuse2_32(codes, lens, xp):
    """Fuse adjacent (<=32-bit code, len<=32) pairs -> (hi, lo, len<=64).

    V = c1 * 2^l2 | c2, exactly (disjoint bit ranges).
    """
    c1, c2 = _pairs(codes, xp)
    l1, l2 = _pairs(lens, xp)
    r = (l2 & 31).astype(xp.uint32)
    rr = (xp.uint32(32) - r) & xp.uint32(31)
    hi = xp.where(l2 > 0, c1 >> rr, xp.uint32(0))      # l2==32 -> rr=0 -> c1
    lo = xp.where(l2 < 32, c1 << r, xp.uint32(0)) | c2
    return hi, lo, l1 + l2


def _fuse2_64(hi, lo, lens, xp):
    """Fuse adjacent (<=64-bit hi:lo, len<=64) pairs -> 4 words + len<=128.

    Returns (v0, v1, v2, v3, len) with v0 the most-significant word of the
    right-aligned 128-bit value VA * 2^LB | VB.
    """
    a_hi, b_hi = _pairs(hi, xp)
    a_lo, b_lo = _pairs(lo, xp)
    l1, l2 = _pairs(lens, xp)
    q = l2 >> 5                                        # 0..2
    r = (l2 & 31).astype(xp.uint32)
    rr = (xp.uint32(32) - r) & xp.uint32(31)
    g1 = xp.where(r > 0, a_hi >> rr, xp.uint32(0))
    g2 = (a_hi << r) | xp.where(r > 0, a_lo >> rr, xp.uint32(0))
    g3 = a_lo << r
    z = xp.zeros_like(g1)
    # [0, g1, g2, g3] shifted up by q words
    v0 = xp.where(q == 2, g2, xp.where(q == 1, g1, z))
    v1 = xp.where(q == 2, g3, xp.where(q == 1, g2, g1))
    v2 = xp.where(q == 2, z, xp.where(q == 1, g3, g2))
    v3 = xp.where(q >= 1, z, g3)
    return v0, v1, v2 | b_hi, v3 | b_lo, l1 + l2


def _fused2w_kernel(v_ref, ends_ref, lens_ref, tbase_ref, out_ref, *,
                    S: int, ntile: int, group: int, max_words: int):
    """Level-1-fused pack: <=64-bit (hi, lo) slots, 3-word span, 12 planes.

    One fusion level halves the slot count while keeping S=512 (M =
    ntile*12 = 108 <= 128), so per-superchunk overhead amortizes like v4
    but over twice the raw codes.  (The 4:1 kernel below is M-bound at
    S=128 and loses its MXU win to per-superchunk overhead — measured
    14.5 ms vs 12.9 v4 vs 7.2 this, at the 12.8M-code 1080p batch.)
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (ntile, 1, S), 0)

    for g in range(group):
        v = v_ref[0, g]                              # (2, S) i32: hi, lo
        ends = ends_ref[0, g, 0, :]
        lens = lens_ref[0, g, 0, :]
        tb = tbase_ref[0, 0, c * group + g] * 128

        off = ends - lens
        word = off >> 5
        in_range = word < max_words
        lw = jnp.where(in_range, word, max_words - 1) - tb
        s = off & 31

        sig = 96 - s - lens                          # window shift, 5-bitty
        q = sig >> 5                                 # 0..3
        r = (sig & 31).astype(jnp.uint32)
        rr = (jnp.uint32(32) - r) & jnp.uint32(31)
        vhi = jnp.where(in_range, v[0].astype(jnp.uint32), jnp.uint32(0))
        vlo = jnp.where(in_range, v[1].astype(jnp.uint32), jnp.uint32(0))
        z = jnp.zeros_like(vhi)
        f0 = jnp.where(r > 0, vhi >> rr, jnp.uint32(0))
        f1 = (vhi << r) | jnp.where(r > 0, vlo >> rr, jnp.uint32(0))
        f2 = vlo << r
        f = [f0, f1, f2]
        w = []
        for j in range(3):
            acc = z
            for qq in range(4):
                if j + qq <= 2:
                    acc = jnp.where(q == qq, f[j + qq], acc)
            w.append(acc)

        planes = [
            jax.lax.shift_right_logical(wj, jnp.uint32(8 * i)) & jnp.uint32(0xFF)
            for wj in w for i in range(4)
        ]
        vals = jnp.stack(
            [p.astype(jnp.int32).astype(jnp.bfloat16) for p in planes], axis=0
        )                                            # (12, S)

        hi = lw >> 7
        lo = lw & 127
        oh_hi = (jax.lax.broadcast_in_dim(hi, (ntile, 1, S), (2,)) == hi_iota
                 ).astype(jnp.bfloat16)
        vh = (jax.lax.broadcast_in_dim(vals, (ntile, 12, S), (1, 2)) * oh_hi
              ).reshape(ntile * 12, S)
        oh_lo = (jax.lax.broadcast_in_dim(lo, (S, 128), (0,)) == lanes
                 ).astype(jnp.bfloat16)
        # output (window-words, planes): the accumulate below then slices
        # the SUBLANE dim dynamically (lane-dim dynamic slices relayout,
        # ~450 cycles each — they dominated the v4 kernel)
        win = jax.lax.dot_general(
            oh_lo, vh, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (128, ntile*12)

        idx = pl.multiple_of(tb, 128)
        for h in range(ntile):
            cur = out_ref[0, pl.ds(idx + h * 128, 128), :]
            out_ref[0, pl.ds(idx + h * 128, 128), :] = (
                cur + win[:, h * 12 : (h + 1) * 12]
            )


@functools.partial(jax.jit, static_argnames=("max_words", "S", "group",
                                               "bit_offset"))
def pack_words_fused2w(codes, lens, max_words: int, S: int = 512, group: int = 16,
                       bit_offset: int = 0):
    """Same contract as pack_words; level-1-fused production kernel."""
    window = 2 * S + 128
    ntile = window // 128
    assert ntile * 12 <= 128, "byte-plane rows exceed one MXU tile"
    assert max_words % 128 == 0 and max_words >= window
    *batch, k = codes.shape
    codes = jnp.where(lens > 0, codes.astype(jnp.uint32), jnp.uint32(0))
    lens = lens.astype(jnp.int32)

    pad = (-k) % (2 * S * group)
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros(tuple(batch) + (pad,), jnp.uint32)], axis=-1
        )
        lens = jnp.concatenate(
            [lens, jnp.zeros(tuple(batch) + (pad,), jnp.int32)], axis=-1
        )

    vhi, vlo, flens = _fuse2_32(codes, lens, jnp)
    ends = jnp.cumsum(flens, axis=-1) + bit_offset
    nbits = ends[..., -1]
    kf = ends.shape[-1]
    nsc = kf // S

    first_word = (ends[..., ::S] - flens[..., ::S]) >> 5
    tile = jnp.minimum(
        jnp.minimum(first_word, max_words - 1) >> 7, (max_words - window) // 128
    ).astype(jnp.int32)

    n = int(np.prod(batch)) if batch else 1
    vwords = jnp.stack([vhi, vlo], axis=-2)           # (..., 2, kf)
    flat_v = vwords.reshape(n, 2, nsc, S).transpose(0, 2, 1, 3).astype(jnp.int32)
    flat_ends = ends.reshape(n, nsc, 1, S).astype(jnp.int32)
    flat_lens = flens.reshape(n, nsc, 1, S)
    flat_tile = tile.reshape(n, 1, nsc)

    ng = nsc // group
    out = pl.pallas_call(
        functools.partial(
            _fused2w_kernel, S=S, ntile=ntile, group=group, max_words=max_words
        ),
        grid=(n, ng),
        in_specs=[
            pl.BlockSpec((1, group, 2, S), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, 1, S), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, 1, S), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nsc), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, max_words, 12), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, max_words, 12), jnp.float32),
    )(flat_v, flat_ends, flat_lens, flat_tile)

    b = out.astype(jnp.uint32)
    words = jnp.zeros((n, max_words), jnp.uint32)
    for j in range(3):
        grp = (b[:, :, 4 * j] | (b[:, :, 4 * j + 1] << 8)
               | (b[:, :, 4 * j + 2] << 16) | (b[:, :, 4 * j + 3] << 24))
        if j:
            grp = jnp.concatenate(
                [jnp.zeros((n, j), jnp.uint32), grp[:, :-j]], axis=-1
            )
        words = words + grp                            # bit-disjoint adds
    return words.reshape(tuple(batch) + (max_words,)), nbits


def _fused4_kernel(v_ref, ends_ref, lens_ref, tbase_ref, out_ref, *,
                   S: int, ntile: int, group: int, max_words: int,
                   acc_ref=None, ng: int = 0, viol_ref=None):
    """acc_ref=None: emit raw (20, max_words) f32 byte planes (combine in
    XLA).  acc_ref set (emit_be mode): planes accumulate in VMEM scratch
    and the last grid step per slice collapses them to byte-swapped u32
    words in out_ref — no f32 plane HBM round trip, words -> bytes is a
    bitcast (see the v6 commentary above).

    viol_ref (debug mode): (1, 128) int32 in-kernel invariant-violation
    accumulator — counts fused-slot lengths outside [0, 128] (a negative
    length breaks offset monotonicity, >128 overflows the 5-word window)
    and, in emit_be mode, byte-plane sums over 255 (bit ranges that were
    supposed to be disjoint overlapped)."""
    c = pl.program_id(1)
    plane_ref = out_ref if acc_ref is None else acc_ref

    @pl.when(c == 0)
    def _():
        plane_ref[...] = jnp.zeros_like(plane_ref)

    if viol_ref is not None:
        @pl.when(c == 0)
        def _():
            viol_ref[...] = jnp.zeros_like(viol_ref)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (ntile, 1, S), 0)

    # ---- elementwise prep for ALL superchunks of the group at once ------
    # Per-g (1, S) vector ops use 1/8 of the VPU and serialize against the
    # MXU; on (group, S) shapes the same ~45-op chain runs 8x wider, so
    # only the matmul + accumulate remain in the per-g loop.
    ends = ends_ref[0, :, 0, :]                      # (group, S)
    lens = lens_ref[0, :, 0, :]

    if viol_ref is not None:
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        bad_len = jnp.sum(((lens < 0) | (lens > 128)).astype(jnp.int32))
        viol_ref[0] = viol_ref[0] + jnp.where(lane0 == 0, bad_len, 0)
    off = ends - lens
    word = off >> 5
    in_range = word < max_words
    wclamp = jnp.where(in_range, word, max_words - 1)
    s = off & 31

    # window alignment: value << (160 - s - len) over 5 words
    sig = 160 - s - lens
    q = sig >> 5                                     # 0..5
    r = (sig & 31).astype(jnp.uint32)
    rr = (32 - r) & jnp.uint32(31)
    vm = [
        jnp.where(in_range, v_ref[0, :, i, :].astype(jnp.uint32), jnp.uint32(0))
        for i in range(4)
    ]
    u = [jnp.zeros_like(vm[0])] + vm                 # U[0]=0, U[1..4]=v0..v3
    f = []
    for i in range(5):
        nxt = u[i + 1] if i + 1 <= 4 else jnp.zeros_like(u[0])
        f.append((u[i] << r) | jnp.where(r > 0, nxt >> rr, jnp.uint32(0)))
    w = []
    for j in range(5):
        acc = jnp.zeros_like(f[0])
        for qq in range(6):
            if j + qq <= 4:
                acc = jnp.where(q == qq, f[j + qq], acc)
        w.append(acc)

    planes = [
        jax.lax.shift_right_logical(wj, jnp.uint32(8 * i)) & jnp.uint32(0xFF)
        for wj in w for i in range(4)
    ]
    vals_all = jnp.stack(
        [p.astype(jnp.int32).astype(jnp.bfloat16) for p in planes], axis=0
    )                                                # (20, group, S)

    for g in range(group):
        tb = tbase_ref[0, 0, c * group + g] * 128
        lw = wclamp[g] - tb
        vals = vals_all[:, g, :]                     # (20, S)

        hi = lw >> 7
        lo = lw & 127
        oh_hi = (jax.lax.broadcast_in_dim(hi, (ntile, 1, S), (2,)) == hi_iota
                 ).astype(jnp.bfloat16)
        vh = (jax.lax.broadcast_in_dim(vals, (ntile, 20, S), (1, 2)) * oh_hi
              ).reshape(ntile * 20, S)
        oh_lo = (jax.lax.broadcast_in_dim(lo, (S, 128), (0,)) == lanes
                 ).astype(jnp.bfloat16)
        win = jax.lax.dot_general(
            vh, oh_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ntile, 20, 128)

        idx = pl.multiple_of(tb, 128)
        for h in range(ntile):
            cur = plane_ref[0, :, pl.ds(idx + h * 128, 128)]
            plane_ref[0, :, pl.ds(idx + h * 128, 128)] = cur + win[h]

    if acc_ref is not None:
        @pl.when(c == ng - 1)
        def _():
            if viol_ref is not None:
                lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                over = jnp.sum((acc_ref[0] > 255.0).astype(jnp.int32))
                viol_ref[0] = viol_ref[0] + jnp.where(lane0 == 0, over, 0)
            b = acc_ref[0].astype(jnp.int32).astype(jnp.uint32)  # (20, mw)
            wlane = jax.lax.broadcasted_iota(jnp.int32, (1, max_words), 1)
            words = jnp.zeros((1, max_words), jnp.uint32)
            for j in range(5):
                grp = (b[4 * j : 4 * j + 1, :]
                       | (b[4 * j + 1 : 4 * j + 2, :] << 8)
                       | (b[4 * j + 2 : 4 * j + 3, :] << 16)
                       | (b[4 * j + 3 : 4 * j + 4, :] << 24))
                if j:
                    grp = jnp.where(
                        wlane < j, jnp.uint32(0), pltpu.roll(grp, j, 1)
                    )
                words = words | grp
            out_ref[0] = (
                ((words & jnp.uint32(0xFF)) << 24)
                | ((words & jnp.uint32(0xFF00)) << 8)
                | ((words >> 8) & jnp.uint32(0xFF00))
                | (words >> 24)
            )


@functools.partial(jax.jit, static_argnames=("max_words", "S", "group",
                                               "bit_offset", "emit_be"))
def pack_words_fused4(codes, lens, max_words: int, S: int = 128, group: int = 32,
                      bit_offset: int = 0, emit_be: bool = False):
    """Same contract as pack_words; 4:1 slot-fused production kernel.

    group=32 measured 5.05 ms vs 7.23 ms at group=16 on the 3.2M-fused-slot
    1080p batch (fewer grid steps, same VMEM).  A variant accumulating via
    sublane-dim dynamic slices (transposed win/out like fused2w) measured
    29 ms — the (128, ntile*20) matmul orientation starves the MXU — so the
    lane-dim accumulate stays."""
    *batch, k = codes.shape
    codes = jnp.where(lens > 0, codes.astype(jnp.uint32), jnp.uint32(0))
    lens = lens.astype(jnp.int32)

    pad = (-k) % (4 * S * group)
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros(tuple(batch) + (pad,), jnp.uint32)], axis=-1
        )
        lens = jnp.concatenate(
            [lens, jnp.zeros(tuple(batch) + (pad,), jnp.int32)], axis=-1
        )

    # two exact fusion levels: (<=32b)x2 -> <=64b, (<=64b)x2 -> <=128b
    h1, l1, len1 = _fuse2_32(codes, lens, jnp)
    v0, v1, v2, v3, flens = _fuse2_64(h1, l1, len1, jnp)
    return pack_words_fused4_core(
        v0, v1, v2, v3, flens, max_words, S=S, group=group,
        bit_offset=bit_offset, emit_be=emit_be,
    )


# ---------------------------------------------------------------------------
# v6 (pack_words_fused8_core): 8:1 slot fusion + in-kernel final combine.
#
# fused4's MXU cost is one column-cycle per fused slot; a third exact
# fusion level ((<=128b)x2 -> <=256b) halves the slot count again.  An
# 8-word slot spans <= 9 output words -> 36 byte planes; M = ntile*36
# must stay <= 128, so ntile = 3 -> window 384 -> S = 32 slots per
# superchunk (the MXU still streams K = S columns per matmul, and total
# columns is what matters: kf/2 of fused4's).
#
# Batch-dependent result worth recording: at 4x1080p fused8 measured
# 14.4 ms vs fused4's 10.0 ms (S = 32 puts only 32 of 128 lanes to work
# in every per-superchunk op, and that lane waste exceeds the 2x column
# saving; growing S is impossible because ntile*36 must stay <= 128).
# At 16x1080p the ranking flips — 14.64 ms vs 15.27 ms per sustained
# step, byte-identical on chip — because the larger grid amortizes the
# lane-starved prep, so fused8 is the production default (EC504_FUSE=4
# restores 4:1).  Its in-kernel combine was also adopted by
# pack_words_fused4_core (emit_be=True).
#
# The final byte-plane combine also moves IN-kernel: the f32 plane
# accumulator lives in VMEM scratch (never hits HBM — fused4 wrote a
# (20, max_words) f32 block per slice, 20x the words), and the last grid
# step per slice collapses it to u32 words with the BYTE-SWAPPED (big-
# endian byte order) value, so words -> bytes is a pure bitcast instead
# of 4 shift/mask passes.  Exactness: the bit stream partitions output
# bits across slots, so per-byte contributions are bit-disjoint and every
# byte-plane sum is <= 255 (f32-exact, and plane shifts can't carry).


def _fuse2_128(v, lens, xp):
    """Fuse adjacent (<=128-bit 4-word value, len<=128) pairs -> 8 words +
    len<=256.  v: list of 4 (..., 2K) word arrays, most-significant first.
    Returns (8 word arrays (..., K) msf, lens (..., K))."""
    a = [_pairs(w, xp)[0] for w in v]
    b = [_pairs(w, xp)[1] for w in v]
    l1, l2 = _pairs(lens, xp)
    q = l2 >> 5                                        # 0..4
    r = (l2 & 31).astype(xp.uint32)
    rr = (xp.uint32(32) - r) & xp.uint32(31)
    u = [xp.zeros_like(a[0])] + a                      # u0 = 0, u1..4 = a0..a3
    f = []
    for i in range(5):
        nxt = u[i + 1] if i + 1 <= 4 else xp.zeros_like(u[0])
        f.append((u[i] << r) | xp.where(r > 0, nxt >> rr, xp.uint32(0)))
    w = []
    for j in range(8):
        acc = xp.zeros_like(f[0])
        for qq in range(5):
            if 0 <= j + qq - 3 <= 4:
                acc = xp.where(q == qq, f[j + qq - 3], acc)
        w.append(acc)
    for j in range(4, 8):
        w[j] = w[j] | b[j - 4]
    return w, l1 + l2


def _fused8_kernel(v_ref, ends_ref, lens_ref, tbase_ref, out_ref, acc_ref, *,
                   S: int, ntile: int, group: int, max_words: int, ng: int):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (ntile, 1, S), 0)

    # group-wide elementwise prep (see _fused4_kernel)
    ends = ends_ref[0, :, 0, :]                      # (group, S)
    lens = lens_ref[0, :, 0, :]
    off = ends - lens
    word = off >> 5
    in_range = word < max_words
    wclamp = jnp.where(in_range, word, max_words - 1)
    s = off & 31

    # window alignment: value << (288 - s - len) over 9 words
    sig = 288 - s - lens
    q = sig >> 5                                     # 0..9
    r = (sig & 31).astype(jnp.uint32)
    rr = (32 - r) & jnp.uint32(31)
    vm = [
        jnp.where(in_range, v_ref[0, :, i, :].astype(jnp.uint32), jnp.uint32(0))
        for i in range(8)
    ]
    u = [jnp.zeros_like(vm[0])] + vm                 # U[0]=0, U[1..8]=v0..v7
    f = []
    for i in range(9):
        nxt = u[i + 1] if i + 1 <= 8 else jnp.zeros_like(u[0])
        f.append((u[i] << r) | jnp.where(r > 0, nxt >> rr, jnp.uint32(0)))
    w = []
    for j in range(9):
        acc = jnp.zeros_like(f[0])
        for qq in range(10):
            if j + qq <= 8:
                acc = jnp.where(q == qq, f[j + qq], acc)
        w.append(acc)

    planes = [
        jax.lax.shift_right_logical(wj, jnp.uint32(8 * i)) & jnp.uint32(0xFF)
        for wj in w for i in range(4)
    ]
    vals_all = jnp.stack(
        [p.astype(jnp.int32).astype(jnp.bfloat16) for p in planes], axis=0
    )                                                # (36, group, S)

    for g in range(group):
        tb = tbase_ref[0, 0, c * group + g] * 128
        lw = wclamp[g] - tb
        vals = vals_all[:, g, :]                     # (36, S)

        hi = lw >> 7
        lo = lw & 127
        oh_hi = (jax.lax.broadcast_in_dim(hi, (ntile, 1, S), (2,)) == hi_iota
                 ).astype(jnp.bfloat16)
        vh = (jax.lax.broadcast_in_dim(vals, (ntile, 36, S), (1, 2)) * oh_hi
              ).reshape(ntile * 36, S)
        oh_lo = (jax.lax.broadcast_in_dim(lo, (S, 128), (0,)) == lanes
                 ).astype(jnp.bfloat16)
        win = jax.lax.dot_general(
            vh, oh_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ntile, 36, 128)

        idx = pl.multiple_of(tb, 128)
        for h in range(ntile):
            cur = acc_ref[:, pl.ds(idx + h * 128, 128)]
            acc_ref[:, pl.ds(idx + h * 128, 128)] = cur + win[h]

    # last superchunk group of this slice: collapse byte planes to words.
    # Bit streams partition output bits across slots, so plane sums are
    # <= 255 per byte: OR == ADD and no group shift can carry.
    @pl.when(c == ng - 1)
    def _():
        b = acc_ref[...].astype(jnp.int32).astype(jnp.uint32)   # (36, mw)
        wlane = jax.lax.broadcasted_iota(jnp.int32, (1, max_words), 1)
        words = jnp.zeros((1, max_words), jnp.uint32)
        for j in range(9):
            grp = (b[4 * j : 4 * j + 1, :]
                   | (b[4 * j + 1 : 4 * j + 2, :] << 8)
                   | (b[4 * j + 2 : 4 * j + 3, :] << 16)
                   | (b[4 * j + 3 : 4 * j + 4, :] << 24))
            if j:
                # shift right j words: lane rotate + zero the wrap-around
                # (misaligned lane concatenates crash the Mosaic layout pass)
                grp = jnp.where(
                    wlane < j, jnp.uint32(0), pltpu.roll(grp, j, 1)
                )
            words = words | grp
        # byte-swap so words -> bytes is a pure little-endian bitcast
        out_ref[0] = (
            ((words & jnp.uint32(0xFF)) << 24)
            | ((words & jnp.uint32(0xFF00)) << 8)
            | ((words >> 8) & jnp.uint32(0xFF00))
            | (words >> 24)
        )


@functools.partial(jax.jit, static_argnames=("max_words", "S", "group",
                                               "bit_offset", "interpret"))
def pack_words_fused8_core(v, flens, max_words: int, S: int = 32,
                           group: int = 36, bit_offset: int = 0,
                           interpret: bool = False):
    """Pack pre-fused 8-word slots -> BYTE-SWAPPED u32 words + bit counts.

    v: tuple of 8 (..., KF) uint32 word arrays, most-significant first;
    flens: (..., KF) int32 bit lengths <= 256.  Output words hold the
    big-endian byte stream in little-endian u32 lanes: serialize with
    words_be_to_bytes (a bitcast), not words_to_bytes."""
    window = 8 * S + 128
    ntile = window // 128
    assert ntile * 36 <= 128, "byte-plane rows exceed one MXU tile"
    assert max_words % 128 == 0 and max_words >= window
    *batch, kf0 = flens.shape
    nsc0 = -(-kf0 // S)
    g_eff = max((g for g in range(1, min(group, nsc0) + 1) if nsc0 % g == 0),
                default=1)
    if g_eff >= group // 2:
        group = g_eff
    pad = (-kf0) % (S * group)
    if pad:
        zu = jnp.zeros(tuple(batch) + (pad,), jnp.uint32)
        v = tuple(jnp.concatenate([w, zu], axis=-1) for w in v)
        flens = jnp.concatenate(
            [flens, jnp.zeros(tuple(batch) + (pad,), jnp.int32)], axis=-1
        )
    ends = jnp.cumsum(flens, axis=-1) + bit_offset
    nbits = ends[..., -1]
    kf = ends.shape[-1]
    nsc = kf // S

    first_word = (ends[..., ::S] - flens[..., ::S]) >> 5
    tile = jnp.minimum(
        jnp.minimum(first_word, max_words - 1) >> 7, (max_words - window) // 128
    ).astype(jnp.int32)

    n = int(np.prod(batch)) if batch else 1
    vwords = jnp.stack(list(v), axis=-2)              # (..., 8, kf)
    flat_v = vwords.reshape(n, 8, nsc, S).transpose(0, 2, 1, 3).astype(jnp.int32)
    flat_ends = ends.reshape(n, nsc, 1, S).astype(jnp.int32)
    flat_lens = flens.reshape(n, nsc, 1, S)
    flat_tile = tile.reshape(n, 1, nsc)

    ng = nsc // group
    words = pl.pallas_call(
        functools.partial(
            _fused8_kernel, S=S, ntile=ntile, group=group,
            max_words=max_words, ng=ng,
        ),
        grid=(n, ng),
        in_specs=[
            pl.BlockSpec((1, group, 8, S), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, 1, S), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, 1, S), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nsc), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, max_words), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 1, max_words), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((36, max_words), jnp.float32)],
        interpret=interpret,
    )(flat_v, flat_ends, flat_lens, flat_tile)
    return words.reshape(tuple(batch) + (max_words,)), nbits


@functools.partial(jax.jit, static_argnames=("max_words", "S", "group",
                                               "bit_offset", "interpret"))
def pack_words_fused8(codes, lens, max_words: int, S: int = 32, group: int = 36,
                      bit_offset: int = 0, interpret: bool = False):
    """Same contract as pack_words but returns BYTE-SWAPPED words (see
    pack_words_fused8_core); three exact fusion levels from raw codes."""
    *batch, k = codes.shape
    codes = jnp.where(lens > 0, codes.astype(jnp.uint32), jnp.uint32(0))
    lens = lens.astype(jnp.int32)

    pad = (-k) % (8 * S * group)
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros(tuple(batch) + (pad,), jnp.uint32)], axis=-1
        )
        lens = jnp.concatenate(
            [lens, jnp.zeros(tuple(batch) + (pad,), jnp.int32)], axis=-1
        )
    h1, l1, len1 = _fuse2_32(codes, lens, jnp)
    v0, v1, v2, v3, flens4 = _fuse2_64(h1, l1, len1, jnp)
    v8, flens8 = _fuse2_128([v0, v1, v2, v3], flens4, jnp)
    return pack_words_fused8_core(
        tuple(v8), flens8, max_words, S=S, group=group, bit_offset=bit_offset,
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("max_words", "S", "group",
                                               "bit_offset", "emit_be",
                                               "interpret", "debug"))
def pack_words_fused4_core(v0, v1, v2, v3, flens, max_words: int, S: int = 128,
                           group: int = 32, bit_offset: int = 0,
                           emit_be: bool = False, interpret: bool = False,
                           debug: bool = False):
    """Pack pre-fused 4-word slots (the fused Pallas VLC kernel emits
    these directly, skipping the XLA fusion prep).  v0..v3: (..., KF)
    uint32 most-to-least significant words of each right-aligned <=128-bit
    value; flens: (..., KF) int32 bit lengths <= 128.

    emit_be=True: the byte-plane combine runs in-kernel (f32 planes stay
    in VMEM scratch) and the returned words are BYTE-SWAPPED — serialize
    with bitpack.words_be_to_bytes (a bitcast), not words_to_bytes.

    debug=True: returns (words, nbits, violations) where violations is a
    per-batch-row int32 count of in-kernel invariant hits (fused-slot
    length out of [0, 128]; emit_be: byte-plane sum > 255) — the SURVEY
    §5 sanitizer analogue, 0 on healthy streams."""
    window = 4 * S + 128
    ntile = window // 128
    assert ntile * 20 <= 128, "byte-plane rows exceed one MXU tile"
    assert max_words % 128 == 0 and max_words >= window
    *batch, kf0 = flens.shape
    # pick the largest group <= requested that divides the superchunk
    # count: at the 1080p shape (90 superchunks/slice) group=32 pads 6.7%
    # of pure waste onto a matmul-bound kernel, group=30 pads nothing
    nsc0 = -(-kf0 // S)
    g_eff = max((g for g in range(1, min(group, nsc0) + 1) if nsc0 % g == 0),
                default=1)
    if g_eff >= group // 2:
        group = g_eff
    pad = (-kf0) % (S * group)
    if pad:
        zu = jnp.zeros(tuple(batch) + (pad,), jnp.uint32)
        v0, v1, v2, v3 = (jnp.concatenate([v, zu], axis=-1) for v in (v0, v1, v2, v3))
        flens = jnp.concatenate(
            [flens, jnp.zeros(tuple(batch) + (pad,), jnp.int32)], axis=-1
        )
    ends = jnp.cumsum(flens, axis=-1) + bit_offset
    nbits = ends[..., -1]
    kf = ends.shape[-1]                               # fused slot count
    nsc = kf // S

    first_word = (ends[..., ::S] - flens[..., ::S]) >> 5
    tile = jnp.minimum(
        jnp.minimum(first_word, max_words - 1) >> 7, (max_words - window) // 128
    ).astype(jnp.int32)

    n = int(np.prod(batch)) if batch else 1
    vwords = jnp.stack([v0, v1, v2, v3], axis=-2)     # (..., 4, kf)
    flat_v = vwords.reshape(n, 4, nsc, S).transpose(0, 2, 1, 3).astype(jnp.int32)
    flat_ends = ends.reshape(n, nsc, 1, S).astype(jnp.int32)
    flat_lens = flens.reshape(n, nsc, 1, S)
    flat_tile = tile.reshape(n, 1, nsc)

    ng = nsc // group
    in_specs = [
        pl.BlockSpec((1, group, 4, S), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, group, 1, S), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, group, 1, S), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nsc), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM),
    ]
    if emit_be:
        out_specs = pl.BlockSpec(
            (1, 1, max_words), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((n, 1, max_words), jnp.uint32)
        if debug:
            vspec = pl.BlockSpec((1, 1, 128), lambda i, c: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
            words, viol = pl.pallas_call(
                lambda v, e, l, t, o, vr, a: _fused4_kernel(
                    v, e, l, t, o, acc_ref=a, ng=ng, viol_ref=vr,
                    S=S, ntile=ntile, group=group, max_words=max_words,
                ),
                grid=(n, ng),
                in_specs=in_specs,
                out_specs=[out_specs, vspec],
                out_shape=[out_shape,
                           jax.ShapeDtypeStruct((n, 1, 128), jnp.int32)],
                scratch_shapes=[pltpu.VMEM((1, 20, max_words), jnp.float32)],
                interpret=interpret,
            )(flat_v, flat_ends, flat_lens, flat_tile)
            return (words.reshape(tuple(batch) + (max_words,)), nbits,
                    viol.reshape(n, -1).sum(axis=-1).reshape(tuple(batch)))
        words = pl.pallas_call(
            lambda v, e, l, t, o, a: _fused4_kernel(
                v, e, l, t, o, acc_ref=a, ng=ng,
                S=S, ntile=ntile, group=group, max_words=max_words,
            ),
            grid=(n, ng),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((1, 20, max_words), jnp.float32)],
            interpret=interpret,
        )(flat_v, flat_ends, flat_lens, flat_tile)
        return words.reshape(tuple(batch) + (max_words,)), nbits

    out = pl.pallas_call(
        functools.partial(
            _fused4_kernel, S=S, ntile=ntile, group=group, max_words=max_words
        ),
        grid=(n, ng),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 20, max_words), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 20, max_words), jnp.float32),
        interpret=interpret,
    )(flat_v, flat_ends, flat_lens, flat_tile)

    b = out.astype(jnp.uint32)
    words = jnp.zeros((n, max_words), jnp.uint32)
    for j in range(5):
        grp = (b[:, 4 * j] | (b[:, 4 * j + 1] << 8)
               | (b[:, 4 * j + 2] << 16) | (b[:, 4 * j + 3] << 24))
        if j:
            grp = jnp.concatenate(
                [jnp.zeros((n, j), jnp.uint32), grp[:, :-j]], axis=-1
            )
        words = words + grp                            # bit-disjoint adds
    if debug:
        # XLA-combine variant of the same guards the emit_be path runs
        # in-kernel: byte-plane sums stay <= 255 and lens stay in range
        viol = (jnp.sum((out > 255.0).astype(jnp.int32), axis=(-2, -1)).reshape(n)
                + jnp.sum(((flens < 0) | (flens > 128)).astype(jnp.int32),
                          axis=-1).reshape(n))
        return (words.reshape(tuple(batch) + (max_words,)), nbits,
                viol.reshape(tuple(batch)))
    return words.reshape(tuple(batch) + (max_words,)), nbits
