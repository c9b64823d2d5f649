"""In-kernel invariant guards (SURVEY §5 sanitizer analogue).

The VLC and pack Pallas kernels carry checkify-style guards behind a
debug flag: slot lengths in range, codewords masked to their length,
fused-slot lengths in [0, 128], pack byte-plane sums <= 255.  Healthy
streams report zero violations; corrupted inputs are detected.  All
cases run the kernels in interpret mode (CPU CI).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from ec504_imageencoder_tpu.ops.pallas_pack import (
    _fuse2_32,
    _fuse2_64,
    pack_words_fused4_core,
)
from ec504_imageencoder_tpu.ops.pallas_vlc import (
    slot_violations,
    vlc_fused_slots_from_blocks_tpu,
)
from ec504_imageencoder_tpu.utils.tables import INTRA_Q_MATRIX


@pytest.fixture(scope="module")
def blocks_qw(rng):
    blocks = rng.integers(0, 256, (2, 64, 12), dtype=np.uint8)
    qw = (INTRA_Q_MATRIX.astype(np.int32) * 8)
    return jnp.asarray(blocks), jnp.asarray(qw)


def test_vlc_kernel_guards_clean_on_valid_input(blocks_qw):
    blocks, qw = blocks_qw
    vstack, flens, viol = vlc_fused_slots_from_blocks_tpu(
        blocks, qw, interpret=True, debug=True
    )
    assert int(np.asarray(viol).sum()) == 0
    # debug mode must not perturb the emission
    v2, f2 = vlc_fused_slots_from_blocks_tpu(blocks, qw, interpret=True)
    assert np.array_equal(np.asarray(vstack), np.asarray(v2))
    assert np.array_equal(np.asarray(flens), np.asarray(f2))


def test_slot_violations_detects_corruption(rng):
    codes = np.zeros((64, 8), np.uint32)
    lens = np.ones((64, 8), np.int32) * 4
    codes[:] = 0xF  # masked to 4 bits: healthy
    assert slot_violations(codes, lens, np).sum() == 0
    codes[3, 2] = 0x1F          # bit above the declared 4-bit length
    lens[10, 5] = 31            # beyond the 30-bit slot maximum
    lens[11, 1] = -1            # negative length
    assert slot_violations(codes.astype(np.uint32), lens, np).sum() == 3


def _fused_case(rng, k=2048):
    lens = rng.integers(0, 25, (1, k)).astype(np.int32)
    codes = (rng.integers(0, 1 << 31, (1, k))
             & ((1 << np.maximum(lens, 1)) - 1)).astype(np.uint32)
    cm = jnp.where(jnp.asarray(lens) > 0, jnp.asarray(codes), jnp.uint32(0))
    h1, l1, len1 = _fuse2_32(cm, jnp.asarray(lens), jnp)
    return _fuse2_64(h1, l1, len1, jnp)


@pytest.mark.parametrize("emit_be", [False, True])
def test_pack_guards_clean_on_valid_input(rng, emit_be):
    v0, v1, v2, v3, fl = _fused_case(rng)
    words, nbits, viol = pack_words_fused4_core(
        v0, v1, v2, v3, fl, 640, bit_offset=38, emit_be=emit_be,
        debug=True, interpret=True,
    )
    assert int(np.asarray(viol).sum()) == 0
    w2, b2 = pack_words_fused4_core(
        v0, v1, v2, v3, fl, 640, bit_offset=38, emit_be=emit_be,
        interpret=True,
    )
    assert np.array_equal(np.asarray(words), np.asarray(w2))
    assert np.array_equal(np.asarray(nbits), np.asarray(b2))


@pytest.mark.parametrize("emit_be", [False, True])
def test_pack_guards_detect_bad_lengths(rng, emit_be):
    v0, v1, v2, v3, fl = _fused_case(rng)
    fl = fl.at[0, 7].set(200)   # fused-slot length beyond the 128-bit max
    _, _, viol = pack_words_fused4_core(
        v0, v1, v2, v3, fl, 640, bit_offset=38, emit_be=emit_be,
        debug=True, interpret=True,
    )
    assert int(np.asarray(viol).sum()) > 0


def test_compat_debug_wiring_interpret(rng):
    """The compat-mode sanitizer wiring (models/encoder._compat_tpu_pipeline
    debug branch): raw-slot kernel + slot_violations + guarded pack, with
    violations surfacing as negated bit counts.  Replicated here in
    interpret mode (the real branch only lowers on TPU)."""
    from ec504_imageencoder_tpu.ops.pallas_vlc import (
        fuse_slots_streamwise,
        vlc_compat_slots_from_blocks_tpu,
    )
    from ec504_imageencoder_tpu.utils.tables import scale_quantization_matrix

    blocks = rng.integers(0, 256, (2, 64, 12), dtype=np.uint8)
    sq = jnp.asarray(scale_quantization_matrix(12).astype(np.int32))
    codes, lens = vlc_compat_slots_from_blocks_tpu(
        jnp.asarray(blocks), sq, interpret=True)
    kviol = slot_violations(
        codes.transpose(1, 0, 2), lens.transpose(1, 0, 2), jnp
    ).transpose(1, 0, 2)
    assert int(np.asarray(kviol).sum()) == 0  # healthy input: no hits
    v0, v1, v2, v3, fl = fuse_slots_streamwise(codes, lens)
    words, nbits, pviol = pack_words_fused4_core(
        v0, v1, v2, v3, fl, 640, bit_offset=38, debug=True, interpret=True)
    viol = pviol + kviol.sum(axis=(-2, -1))
    nbits2 = jnp.where(viol > 0, -viol, nbits)
    assert np.array_equal(np.asarray(nbits2), np.asarray(nbits))
    # corrupted slots must negate the bit counts (what encode_compat
    # raises on)
    bad = kviol.at[0, 0, 0].set(3)
    nbits3 = jnp.where(bad.sum(axis=(-2, -1)) + pviol > 0,
                       -(bad.sum(axis=(-2, -1)) + pviol), nbits)
    assert int(np.asarray(nbits3)[0]) < 0
