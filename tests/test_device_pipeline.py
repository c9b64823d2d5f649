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


def test_block_streams_correct64_matches_65slot(rng):
    """The lane-aligned 64-slot layout (EOB folded into slot 63, MB code
    folded into the DC slot, header as a pack bit offset) must pack to the
    exact bit stream of the original 65-slot assembly."""
    from ec504_imageencoder_tpu.ops.vlc_device import (
        block_streams_correct,
        block_streams_correct64,
    )

    for trial in range(200):
        nblk = 12
        zz = np.zeros((nblk, 64), np.int32)
        for b in range(nblk):
            n = rng.integers(0, 40)
            pos = rng.choice(64, size=n, replace=False)
            zz[b, pos] = rng.integers(-300, 301, size=n)
        zz[:, 0] = rng.integers(0, 256, size=nblk)  # DC absolute values
        pred = rng.integers(0, 256, size=nblk).astype(np.int32)
        is_luma = rng.integers(0, 2, size=nblk).astype(np.int32)
        mb_first = (np.arange(nblk) % 6 == 0).astype(np.int32)

        # original layout: explicit MB-prefix slot + 65 block slots
        c65, l65 = block_streams_correct(zz, pred, is_luma)
        ref_c, ref_l = [], []
        for b in range(nblk):
            if mb_first[b]:
                ref_c.append(np.uint32(0b11))
                ref_l.append(np.int32(2))
            ref_c.extend(c65[b])
            ref_l.extend(l65[b])
        ref_codes = np.array(ref_c, np.uint32)[None]
        ref_lens = np.array(ref_l, np.int32)[None]
        want, want_bits = pack_bytes(ref_codes, ref_lens, 1024)

        c64, l64 = block_streams_correct64(zz, pred, is_luma, mb_first=mb_first)
        got, got_bits = pack_bytes(
            c64.reshape(1, -1), l64.reshape(1, -1), 1024
        )
        assert int(got_bits[0]) == int(want_bits[0]), trial
        assert np.array_equal(got, want), trial


def test_pack_bit_offset_matches_shifted_stream():
    """bit_offset=38 packs the same bits 38 positions later."""
    rng2 = np.random.default_rng(11)
    lens = rng2.integers(0, 25, (3, 200)).astype(np.int32)
    codes = (rng2.integers(0, 1 << 31, (3, 200)) &
             ((1 << np.maximum(lens, 1)) - 1)).astype(np.uint32)
    plain, bits = pack_bytes(codes, lens, 1024)
    shifted, bits38 = pack_bytes(codes, lens, 1024, bit_offset=38)
    assert np.array_equal(bits38, bits + 38)
    # re-align by prepending 38 zero bits to the plain stream
    for r in range(3):
        w = BitWriter()
        w.put(0, 38)
        nb = int(bits[r])
        for i in range(nb):
            w.put((plain[r, i // 8] >> (7 - i % 8)) & 1, 1)
        want = w.tobytes()
        assert bytes(shifted[r, : len(want)]) == want


def test_compact_slices_roundtrip(rng):
    """Device-side segment compaction (slow-link D2H optimization) must
    reproduce exactly the used byte prefix of every slice."""
    import jax.numpy as jnp

    from ec504_imageencoder_tpu.ops.bitpack import (
        compact_slices,
        split_compact_slices,
    )

    b, s, msb = 3, 5, 256
    seg = rng.integers(0, 256, (b, s, msb), dtype=np.uint8)
    bits = rng.integers(0, 8 * msb + 1, (b, s)).astype(np.int32)
    total_w = int(((bits + 31) // 32).sum())
    cap = total_w + msb // 4
    dense, offs = compact_slices(jnp.asarray(seg), jnp.asarray(bits), cap)
    rows = split_compact_slices(np.asarray(dense), bits)
    for i in range(b):
        for j in range(s):
            nb = (int(bits[i, j]) + 7) // 8
            np.testing.assert_array_equal(
                np.frombuffer(bytes(rows[i][j]), np.uint8),
                seg[i, j, :nb],
            )
