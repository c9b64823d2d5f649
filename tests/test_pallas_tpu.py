"""TPU-only exactness tests for the Pallas pack kernels.

The CPU suite (conftest pins JAX_PLATFORMS=cpu) cannot lower Pallas TPU
kernels, so these tests only run when a real TPU is attached — e.g.
`EC504_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py` outside the
CPU-pinned conftest environment.  They fuzz every TPU pack formulation
against the numpy oracle (ops.bitpack.pack_words), including worst-case
all-32-bit spans and overflow-drop semantics.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

if jax.default_backend() != "tpu":
    pytest.skip("requires a TPU backend", allow_module_level=True)

import jax.numpy as jnp

from ec504_imageencoder_tpu.ops.bitpack import pack_words, pack_words_mxu
from ec504_imageencoder_tpu.ops.pallas_pack import (
    pack_words_fused,
    pack_words_fused2w,
    pack_words_fused4,
    pack_words_fused8,
    pack_words_pallas,
    pack_words_pallas3,
)


def _unswap8(fn):
    """Byte-swapped-word emitters (fused8, fused4 emit_be); normalize for
    the oracle."""

    def run(c, l, w, **kw):
        words, nbits = fn(c, l, w, **kw)
        return (
            ((words & 0xFF) << 24) | ((words & 0xFF00) << 8)
            | ((words >> 8) & 0xFF00) | (words >> 24)
        ), nbits

    return run


def _fused4be(c, l, w, **kw):
    return pack_words_fused4(c, l, w, emit_be=True, **kw)


IMPLS = {
    # fn, minimum max_words the formulation supports (window size)
    "fused": (lambda c, l, w: pack_words_fused(c, l, w), 640),
    "fused2w": (lambda c, l, w: pack_words_fused2w(c, l, w), 1152),
    "fused4": (lambda c, l, w: pack_words_fused4(c, l, w), 640),
    # production default (EC504_PACK_BE=1): in-kernel byte-plane combine
    "fused4be": (_unswap8(_fused4be), 640),
    "fused8": (_unswap8(pack_words_fused8), 384),
    "pallas3": (lambda c, l, w: pack_words_pallas3(c, l, w), 384),
    "pallas1": (lambda c, l, w: pack_words_pallas(c, l, w), 192),
    "mxu": (lambda c, l, w: pack_words_mxu(c, l, w), 0),
}


def _fuzz_case(rng, b, k, dense=False):
    if dense:
        lens = np.full((b, k), 32, np.int32)
    else:
        lens = rng.integers(0, 25, (b, k)).astype(np.int32)
        lens[:, ::7] = 0
        lens[0, : min(5, k)] = 24
    maxv = (1 << lens.astype(np.int64)) - 1
    codes = (rng.integers(0, 1 << 62, (b, k)) % (maxv + 1)).astype(np.uint32)
    return codes, lens


@pytest.mark.parametrize("impl", sorted(IMPLS))
def test_pack_matches_oracle(impl):
    rng = np.random.default_rng(42)
    fn, min_words = IMPLS[impl]
    for b, k, mw, dense in [(3, 4096, 1536, False), (2, 2048, 2304, True),
                            (1, 700, 768, False)]:
        if mw < min_words:
            continue  # formulation needs a larger output window
        codes, lens = _fuzz_case(rng, b, k, dense)
        ref_w, ref_b = pack_words(codes, lens, mw, xp=np)
        got_w, got_b = fn(jnp.asarray(codes), jnp.asarray(lens), mw)
        assert np.array_equal(ref_w, np.asarray(got_w)), impl
        assert np.array_equal(ref_b, np.asarray(got_b)), impl


OFFSET_IMPLS = {
    "fused": lambda c, l, w: pack_words_fused(c, l, w, bit_offset=38),
    "fused2w": lambda c, l, w: pack_words_fused2w(c, l, w, bit_offset=38),
    "fused4": lambda c, l, w: pack_words_fused4(c, l, w, bit_offset=38),
    "fused4be": lambda c, l, w: _unswap8(_fused4be)(c, l, w, bit_offset=38),
    "fused8": lambda c, l, w: _unswap8(pack_words_fused8)(c, l, w, bit_offset=38),
    "pallas3": lambda c, l, w: pack_words_pallas3(c, l, w, bit_offset=38),
    "pallas1": lambda c, l, w: pack_words_pallas(c, l, w, bit_offset=38),
    "mxu": lambda c, l, w: pack_words_mxu(c, l, w, bit_offset=38),
}


@pytest.mark.parametrize("impl", sorted(OFFSET_IMPLS))
def test_pack_bit_offset_matches_oracle(impl):
    """bit_offset=38 (the slice-header reservation) against the numpy oracle."""
    rng = np.random.default_rng(7)
    fn = OFFSET_IMPLS[impl]
    for b, k, mw, dense in [(2, 4096, 1536, False), (1, 2048, 2304, True)]:
        codes, lens = _fuzz_case(rng, b, k, dense)
        ref_w, ref_b = pack_words(codes, lens, mw, xp=np, bit_offset=38)
        got_w, got_b = fn(jnp.asarray(codes), jnp.asarray(lens), mw)
        assert np.array_equal(ref_w, np.asarray(got_w)), impl
        assert np.array_equal(ref_b, np.asarray(got_b)), impl


def test_pack_overflow_drop():
    """Codes past max_words are dropped, matching the oracle."""
    rng = np.random.default_rng(7)
    codes, lens = _fuzz_case(rng, 2, 4096, dense=True)  # 4096 words of data
    mw = 768  # far smaller than the stream
    ref_w, ref_b = pack_words(codes, lens, mw, xp=np)
    got_w, got_b = pack_words_fused(jnp.asarray(codes), jnp.asarray(lens), mw)
    assert np.array_equal(ref_w, np.asarray(got_w))
    assert np.array_equal(ref_b, np.asarray(got_b))
