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


def _prep(codes, lens):
    """Elementwise prep: per-code word index + the two word contributions."""
    codes = jnp.where(lens > 0, codes.astype(jnp.uint32), jnp.uint32(0))
    lens = lens.astype(jnp.int32)
    ends = jnp.cumsum(lens, axis=-1)
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


@functools.partial(jax.jit, static_argnames=("max_words",))
def pack_words_pallas(codes, lens, max_words: int):
    """(..., K) codes/lens -> ((..., max_words) uint32 big-endian words,
    (...,) total bit counts).  TPU-only; validated against ops.bitpack."""
    assert max_words >= WINDOW, "output buffer smaller than one window"
    *batch, k = codes.shape
    word, w0, w1, nbits = _prep(codes, lens)

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
