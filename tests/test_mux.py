"""MPEG-1 program-stream muxing (correct-mode container parity)."""

import numpy as np
import pytest

from ec504_imageencoder_tpu.models.decoder import decode_es, psnr
from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
from ec504_imageencoder_tpu.ops.rle_vlc import mv_code
from ec504_imageencoder_tpu.syntax import headers, mux


@pytest.fixture(scope="module")
def es_and_frames(fixture_frames):
    frames = np.stack([fixture_frames["0"], fixture_frames["1"]])[:, :160, :240]
    enc = MPEG1IntraEncoder(quality=50, backend="numpy", gop_size=1)
    return enc.encode(frames) + headers.sequence_end(), frames


def test_ps_mux_demux_roundtrip(es_and_frames):
    es, frames = es_and_frames
    pics = mux.split_es_pictures(es[:-4])
    assert len(pics) == len(frames)
    ps = mux.mux_program_stream(pics, fps=25.0)
    assert ps.startswith(headers.PACK_START)
    es2 = mux.demux_program_stream(ps)
    dec = decode_es(es2)
    assert len(dec) == len(frames)
    assert psnr(frames[0], dec[0]) > 35


def test_ps_large_picture_splits_packets(es_and_frames):
    es, _ = es_and_frames
    big = es[:-4] * 20  # force > 64KB payloads
    ps = mux.mux_program_stream([big], fps=25.0)
    assert mux.demux_program_stream(ps) == big + headers.sequence_end()


def test_mv_codes_match_reference_table():
    # magnitudes per table B.4 (vlc.c:87-105); negative sets the last bit
    assert mv_code(0) == (0b1, 1)
    assert mv_code(1) == (0b010, 3)
    assert mv_code(-1) == (0b011, 3)
    assert mv_code(16) == (0b00000011000, 11)
    assert mv_code(-16) == (0b00000011001, 11)
    with pytest.raises(ValueError):
        mv_code(17)


def test_decode_stream_handles_both_containers(es_and_frames):
    from ec504_imageencoder_tpu.models.decoder import decode_stream

    es, frames = es_and_frames
    ps = mux.mux_program_stream(mux.split_es_pictures(es[:-4]), fps=25.0)
    for blob in (es, ps):
        dec = decode_stream(blob)
        assert len(dec) == len(frames)
        assert psnr(frames[0], dec[0]) > 35
