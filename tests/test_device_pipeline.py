"""Device (jitted) pipeline vs host oracle: compat byte-exactness and
correct-mode equivalence, on the CPU backend with 8 virtual devices."""

import numpy as np
import pytest

from ec504_imageencoder_tpu.models import encoder as enc_mod
from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder, correct_pipeline
from ec504_imageencoder_tpu.models.oracle import encode_compat as oracle_encode
from ec504_imageencoder_tpu.ops.bitpack import pack_bytes
from ec504_imageencoder_tpu.ops.rle_vlc import compat_block_codes
from ec504_imageencoder_tpu.ops.vlc_device import block_streams_compat
from ec504_imageencoder_tpu.syntax.bitwriter import BitWriter


@pytest.fixture(scope="module")
def small_frames(fixture_frames, frame_order):
    return np.stack([fixture_frames[k] for k in frame_order[:4]])


def test_compat_numpy_pipeline_matches_oracle(small_frames, golden_mpeg):
    mine, _ = enc_mod.encode_compat(small_frames, 12, backend="numpy")
    want, _ = oracle_encode(list(small_frames), 12)
    assert mine == want


def test_compat_jax_pipeline_byte_exact(fixture_frames, frame_order, golden_mpeg):
    frames = np.stack([fixture_frames[k] for k in frame_order])
    mine, dumps = enc_mod.encode_compat(frames, 12, backend="jax")
    assert mine == golden_mpeg


def test_compat_quality_sweep_jax_vs_numpy(small_frames):
    for q in (1, 25, 75, 100):
        a, _ = enc_mod.encode_compat(small_frames, q, backend="jax")
        b, _ = enc_mod.encode_compat(small_frames, q, backend="numpy")
        assert a == b, f"quality {q}"


def test_vlc_device_fuzz_vs_scalar_oracle(rng):
    for _ in range(500):
        zz = np.zeros(64, np.int32)
        n = rng.integers(0, 24)
        pos = rng.choice(64, size=n, replace=False)
        zz[pos] = rng.integers(-255, 256, size=n)
        is_luma = bool(rng.integers(2))
        w = BitWriter()
        for c, nb in compat_block_codes(zz, is_luma):
            w.put(c, nb)
        codes, lens = block_streams_compat(zz[None], np.array([is_luma]))
        got, bits = pack_bytes(codes, lens, 256)
        assert int(bits[0]) == w.nbits
        assert bytes(got[0][: (w.nbits + 7) // 8]) == w.tobytes()


def test_correct_pipeline_jax_matches_numpy(small_frames):
    import jax.numpy as jnp

    enc = MPEG1IntraEncoder(quality=40, backend="numpy", max_slice_bytes=8192)
    padded = small_frames[:2, :96, :128]
    seg_np, bits_np = correct_pipeline(padded, enc.intra_q, enc.qscale, 8192, xp=np)
    import jax

    seg_j, bits_j = jax.jit(
        lambda f, m: correct_pipeline(f, m, enc.qscale, 8192, xp=jnp)
    )(padded, enc.intra_q)
    np.testing.assert_array_equal(np.asarray(bits_j), bits_np)
    np.testing.assert_array_equal(np.asarray(seg_j), seg_np)


def test_input_validation():
    with pytest.raises(ValueError, match="too small"):
        enc_mod.encode_compat(np.zeros((1, 64, 64, 3), np.uint8))
    with pytest.raises(ValueError, match="uint8"):
        enc_mod.encode_compat(np.zeros((1, 600, 400, 3), np.float32))
    with pytest.raises(ValueError, match="RGB"):
        enc_mod.encode_compat(np.zeros((1, 600, 400), np.uint8))


def test_correct_pipeline_backend_determinism_quality_sweep(small_frames):
    """The default (aan) pipeline must produce identical bytes under numpy
    and jax at every quality — guards against nondeterministic float ops
    sneaking into the device path (FMA fusion flips rounded pixels)."""
    import jax
    import jax.numpy as jnp

    from ec504_imageencoder_tpu.models.mpeg1 import (
        correct_pipeline,
        pad_to_macroblocks,
        quality_to_quant,
    )

    padded = pad_to_macroblocks(small_frames[:2, :180, :230])
    for q in (1, 12, 60, 95):
        iq, qs = quality_to_quant(q)
        sn, bn = correct_pipeline(padded, iq, qs, 16384, xp=np)
        sj, bj = jax.jit(
            lambda f, m, qs=qs: correct_pipeline(f, m, qs, 16384, xp=jnp)
        )(padded, iq)
        assert np.array_equal(np.asarray(bj), bn), f"q={q} bit lengths"
        assert np.array_equal(np.asarray(sj), sn), f"q={q} bytes"
