"""Correct-mode (ISO-compliant) encoder: round trip through the
independent spec decoder, padding behavior, stream structure."""

import numpy as np
import pytest

from ec504_imageencoder_tpu.models.decoder import decode_es, psnr
from ec504_imageencoder_tpu.models.mpeg1 import (
    MPEG1IntraEncoder,
    quality_to_quant,
    sequence_header_es,
)
from ec504_imageencoder_tpu.syntax import headers


@pytest.fixture(scope="module")
def crop(fixture_frames):
    return np.stack([fixture_frames["0"], fixture_frames["2"]])[:, :160, :240]


def _roundtrip(frames, quality, **kw):
    enc = MPEG1IntraEncoder(quality=quality, backend="numpy", **kw)
    es = enc.encode(frames) + headers.sequence_end()
    dec = decode_es(es)
    assert len(dec) == len(frames)
    return es, dec


def test_roundtrip_psnr(crop):
    es, dec = _roundtrip(crop, 50)
    for i in range(len(crop)):
        assert dec[i].shape == crop[i].shape
        p = psnr(crop[i], dec[i])
        assert p > 32.0, f"frame {i}: PSNR {p:.2f}"


def test_quality_monotonic_size(crop):
    sizes = [len(_roundtrip(crop, q)[0]) for q in (10, 40, 80)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_odd_dimensions_padded_and_cropped(fixture_frames):
    f = fixture_frames["1"][None, :150, :100]  # not multiples of 16
    es, dec = _roundtrip(f, 60)
    assert dec[0].shape == (150, 100, 3)
    assert psnr(f[0], dec[0]) > 30.0


def test_gop_and_temporal_ref(crop):
    enc = MPEG1IntraEncoder(quality=30, gop_size=1, backend="numpy")
    es = enc.encode(crop) + headers.sequence_end()
    # one sequence header + GOP per frame
    assert es.count(headers.SEQUENCE_START) == len(crop)
    assert es.count(headers.GOP_START) == len(crop)
    assert decode_es(es)[0].shape == crop[0].shape


def test_streaming_chunks_match_single_shot(crop):
    enc = MPEG1IntraEncoder(quality=30, gop_size=2, backend="numpy")
    whole = enc.encode(np.concatenate([crop, crop]))
    chunked = enc.encode(crop, first_frame_index=0) + enc.encode(
        crop, first_frame_index=2
    )
    assert whole == chunked


def test_quality_to_quant_ranges():
    for q in (1, 12, 50, 100):
        m, s = quality_to_quant(q)
        assert m.min() >= 1 and m.max() <= 255
        assert 1 <= s <= 31


def test_quality_to_quant_low_quality_saturation():
    """Below quality 5 the 5-bit quant_scale and 8-bit matrix entries clamp
    (documented in the quality_to_quant docstring): the effective step
    sizes hit the 31*255/8 ceiling instead of tracking the JPEG mapping;
    from quality 5 up they track it to within 0.3% per entry."""
    from ec504_imageencoder_tpu.utils.tables import scale_quantization_matrix

    ceiling = 31 * 255 / 8
    for q in (1, 2, 3, 4):
        w, s = quality_to_quant(q)
        eff = s * w.astype(np.int64) / 8.0
        target = scale_quantization_matrix(q).astype(np.int64)
        assert s == 31
        assert (w == 255).any(), q
        assert eff.max() == ceiling and target.max() > ceiling, q
    for q in (5, 8, 25, 60):
        w, s = quality_to_quant(q)
        eff = s * w.astype(np.int64) / 8.0
        target = scale_quantization_matrix(q).astype(np.int64)
        assert np.abs(eff - target).max() / target.max() < 0.003, q


def test_oversized_dimensions_rejected():
    """12-bit sequence-header fields bound W at 4095; the 0x01..0xAF slice
    start-code range bounds H at 2800 — instead of wrapping the header
    fields (the reference's Q1 truncation bug), encode() refuses."""
    enc = MPEG1IntraEncoder(quality=50, backend="numpy")
    with pytest.raises(ValueError, match="exceeds MPEG-1 limits"):
        enc.encode(np.zeros((1, 16, 4096, 3), np.uint8))
    with pytest.raises(ValueError, match="exceeds MPEG-1 limits"):
        enc.encode(np.zeros((1, 2816, 16, 3), np.uint8))


def test_sequence_header_parse_roundtrip():
    m, _ = quality_to_quant(35)
    hdr = sequence_header_es(1920, 1080, 3, intra_matrix=m)
    from ec504_imageencoder_tpu.models.decoder import BitReader, _read_sequence_header

    r = BitReader(hdr)
    assert r.next_start_code() == 0xB3
    info = _read_sequence_header(r)
    assert (info.width, info.height) == (1920, 1080)
    np.testing.assert_array_equal(info.intra_matrix, m)


def test_overflow_detection(crop):
    # grow_slices=False restores the hard failure for callers that cap
    # device memory deliberately
    enc = MPEG1IntraEncoder(quality=95, backend="numpy", max_slice_bytes=64,
                            grow_slices=False)
    with pytest.raises(OverflowError):
        enc.encode(crop[:1])


def test_slice_buffer_regrows_on_overflow(crop):
    # default behavior: an undersized explicit buffer regrows (reference
    # analogue: growable bitvector, bit_vector.c:148-169) and the stream
    # is identical to one encoded with ample headroom
    small = MPEG1IntraEncoder(quality=95, backend="numpy", max_slice_bytes=64)
    es_small = small.encode(crop[:1])
    assert small.max_slice_bytes > 64  # regrew
    big = MPEG1IntraEncoder(quality=95, backend="numpy",
                            max_slice_bytes=65536)
    assert es_small == big.encode(crop[:1])


def test_auto_slice_sizing_defaults():
    from ec504_imageencoder_tpu.models.mpeg1 import (
        initial_slice_bytes,
        slice_bytes_bucket,
        worst_case_slice_bytes,
    )

    # fused-kernel granularity: 512-multiples >= 2560
    assert slice_bytes_bucket(1) == 2560
    assert slice_bytes_bucket(20481) == 20992
    for q in (1, 50, 95, 100):
        init = initial_slice_bytes(q, 120)
        assert init % 512 == 0 and init >= 2560
        assert init <= worst_case_slice_bytes(120)


def test_worst_case_noise_encodes_with_defaults(rng):
    # adversarial content at fine quantization: near-worst-case slices
    # must encode with NO manual max_slice_bytes knob (VERDICT r4 item 2);
    # 1080p-grade width at q=95 (one MB row tall keeps the CPU run fast —
    # the slice byte budget depends on width only)
    noise = rng.integers(0, 256, (1, 16, 1920, 3), dtype=np.uint8)
    enc = MPEG1IntraEncoder(quality=95, backend="numpy")
    es = enc.encode(noise) + headers.sequence_end()
    dec = decode_es(es)
    assert dec[0].shape == (16, 1920, 3)


def test_reference_vlc_typo_fixed_in_correct_mode():
    """The reference transcribes (16,2) as a 15-bit code identical to
    (0,35) (vlc.c:271 vs :210) — streams using both are undecodable.
    Correct mode uses the ISO 16-bit code; compat keeps the reference's
    bytes (encode-only)."""
    from ec504_imageencoder_tpu.utils import tables

    assert tables.AC_LEN_CORRECT[16, 2] == 16
    assert tables.AC_CODE_CORRECT[16, 2] == 0b0000000000010101
    assert tables.AC_CODE_CORRECT[0, 35] == 0b000000000010101
    assert tables.AC_LEN_CORRECT[0, 35] == 15
    # compat view preserves the reference bug (indexed at level-1, Q4 shift)
    assert tables.AC_LEN_COMPAT[16, 2] == 15


def test_high_quality_roundtrip_regression(crop):
    """q>=75 streams exercise dense coefficients incl. the (16,2)/(0,35)
    collision that the table typo caused."""
    for q in (75, 95):
        es, dec = _roundtrip(crop[:1], q)
        assert psnr(crop[0], dec[0]) > 35.0


def test_color_range_validated():
    """Library API rejects invalid color_range instead of silently picking
    full-range (ADVICE r1: 'limited' typo selected full-range conversion)."""
    from ec504_imageencoder_tpu.models.mpeg1 import correct_pipeline
    from ec504_imageencoder_tpu.ops.color import ycbcr_to_rgb_f32

    with pytest.raises(ValueError, match="color_range"):
        MPEG1IntraEncoder(color_range="limited")
    with pytest.raises(ValueError, match="color_range"):
        correct_pipeline(
            np.zeros((1, 16, 16, 3), np.uint8), np.ones((8, 8), np.int32),
            8, 256, color_range="limited",
        )
    p = np.zeros((8, 8), np.uint8)
    with pytest.raises(ValueError, match="color_range"):
        ycbcr_to_rgb_f32(p, p, p, color_range="limited")
