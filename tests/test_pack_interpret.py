"""Interpret-mode exactness tests for the newest Pallas pack kernels.

These interpret-mode cases keep the emit_be combine and the 8:1 fusion
level under test on CPU, but interpret mode does NOT prove Mosaic
lowering on real hardware (commit 2a061c5 fixed a kernel that passed
interpret and failed on the chip) — the authoritative suite is
test_pallas_tpu.py (incl. its fused4be entries), run on the chip with
`EC504_TPU_TESTS=1`.  Small shapes — the Pallas interpreter is slow.
"""

import numpy as np

from ec504_imageencoder_tpu.ops.bitpack import pack_words


def _case(rng, b, k):
    lens = rng.integers(0, 29, (b, k)).astype(np.int32)
    lens[rng.random((b, k)) < 0.5] = 0
    codes = (rng.integers(0, 1 << 31, (b, k))
             & ((1 << np.maximum(lens, 1)) - 1)).astype(np.uint32)
    return codes, lens


def _unswap(words):
    w = np.asarray(words)
    return ((w & 0xFF) << 24) | ((w & 0xFF00) << 8) | ((w >> 8) & 0xFF00) | (w >> 24)


def test_fused4_emit_be_interpret(rng):
    import jax.numpy as jnp

    from ec504_imageencoder_tpu.ops.pallas_pack import (
        _fuse2_32,
        _fuse2_64,
        pack_words_fused4_core,
    )

    codes, lens = _case(rng, 2, 2048)
    mw = 640
    want, want_bits = pack_words(codes, lens, mw, xp=np, bit_offset=38)
    cm = jnp.where(jnp.asarray(lens) > 0, jnp.asarray(codes), jnp.uint32(0))
    h1, l1, len1 = _fuse2_32(cm, jnp.asarray(lens), jnp)
    v0, v1, v2, v3, fl = _fuse2_64(h1, l1, len1, jnp)
    got, got_bits = pack_words_fused4_core(
        v0, v1, v2, v3, fl, mw, bit_offset=38, emit_be=True, interpret=True
    )
    assert np.array_equal(np.asarray(got_bits), want_bits)
    assert np.array_equal(_unswap(got), want.astype(np.uint32))


def test_fused8_interpret(rng):
    import jax.numpy as jnp

    from ec504_imageencoder_tpu.ops.pallas_pack import pack_words_fused8

    codes, lens = _case(rng, 2, 2048)
    mw = 640
    want, want_bits = pack_words(codes, lens, mw, xp=np, bit_offset=38)
    got, got_bits = pack_words_fused8(
        jnp.asarray(codes), jnp.asarray(lens), mw, bit_offset=38,
        interpret=True,
    )
    assert np.array_equal(np.asarray(got_bits), want_bits)
    assert np.array_equal(_unswap(got), want.astype(np.uint32))


def test_words_be_to_bytes_is_byte_order_inverse(rng):
    import jax.numpy as jnp

    from ec504_imageencoder_tpu.ops.bitpack import words_be_to_bytes, words_to_bytes

    w = rng.integers(0, 1 << 32, (3, 64), dtype=np.uint64).astype(np.uint32)
    swapped = ((w & 0xFF) << 24) | ((w & 0xFF00) << 8) | ((w >> 8) & 0xFF00) | (w >> 24)
    assert np.array_equal(
        np.asarray(words_be_to_bytes(jnp.asarray(swapped))),
        words_to_bytes(w, xp=np).astype(np.uint8),
    )
