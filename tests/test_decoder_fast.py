"""decode_es_fast must match the scalar spec oracle bit-for-bit and keep
its typed error surface (r4 VERDICT item 6: the fast path is what makes
1080p RD verification practical)."""

import numpy as np
import pytest

from ec504_imageencoder_tpu.models.decoder import (
    CorruptStreamError,
    StreamError,
    decode_es,
    decode_es_fast,
)
from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
from ec504_imageencoder_tpu.syntax import headers


@pytest.fixture(scope="module")
def crop(fixture_frames):
    return np.stack([fixture_frames["0"], fixture_frames["1"],
                     fixture_frames["2"]])[:, :160, :240]


@pytest.mark.parametrize("q", [5, 12, 45, 85])
def test_fast_matches_oracle(crop, q):
    enc = MPEG1IntraEncoder(quality=q, backend="numpy", gop_size=2)
    es = enc.encode(crop) + headers.sequence_end()
    a = decode_es(es)
    b = decode_es_fast(es)
    assert len(a) == len(b) == len(crop)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_fast_matches_oracle_odd_dims(fixture_frames):
    f = fixture_frames["1"][None, :150, :100]
    enc = MPEG1IntraEncoder(quality=60, backend="numpy")
    es = enc.encode(f) + headers.sequence_end()
    np.testing.assert_array_equal(decode_es(es)[0], decode_es_fast(es)[0])


def test_fast_error_surface(crop):
    enc = MPEG1IntraEncoder(quality=40, backend="numpy")
    es = enc.encode(crop[:1]) + headers.sequence_end()
    # truncated mid-slice
    with pytest.raises(StreamError):
        decode_es_fast(es[: len(es) // 2])
    # corrupt slice payload
    bad = bytearray(es)
    bad[len(bad) // 2 : len(bad) // 2 + 16] = b"\xff" * 16
    with pytest.raises(StreamError):
        decode_es_fast(bytes(bad))
    # bad picture type
    with pytest.raises(CorruptStreamError):
        decode_es_fast(
            headers.SEQUENCE_START + b"\x19\x00\xb0\x13\xff\xff\xe0\x18"
            b"\x00\x00\x00\x00\x00\x00\x01\x00" + b"\x00\x00\x40\x00"
        )


def test_fast_1080p_practical(fixture_frames):
    """A 1080p frame decodes in seconds, not minutes."""
    import time

    big = np.tile(fixture_frames["0"], (2, 5, 1))[None, :1080, :1920]
    enc = MPEG1IntraEncoder(quality=50, backend="numpy")
    es = enc.encode(big) + headers.sequence_end()
    t0 = time.time()
    dec = decode_es_fast(es)
    assert time.time() - t0 < 30.0
    assert dec[0].shape == (1080, 1920, 3)
