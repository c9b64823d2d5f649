"""Decoder robustness on malformed input: typed StreamError exceptions
instead of bare IndexError crashes (the decoder doubles as a stream
verifier, so diagnosable failures are part of its contract)."""

import numpy as np
import pytest

from ec504_imageencoder_tpu.models.decoder import (
    CorruptStreamError,
    StreamError,
    TruncatedStreamError,
    decode_es,
)
from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
from ec504_imageencoder_tpu.syntax import headers


@pytest.fixture(scope="module")
def small_es():
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (1, 64, 80, 3), dtype=np.uint8)
    enc = MPEG1IntraEncoder(quality=40, backend="numpy")
    return enc.encode(frames) + headers.sequence_end()


def test_valid_stream_decodes(small_es):
    assert len(decode_es(small_es)) == 1


def test_truncated_stream_raises_typed_error(small_es):
    # cut inside slice data (past the headers, before the end)
    for frac in (0.5, 0.9):
        cut = small_es[: int(len(small_es) * frac)]
        with pytest.raises(StreamError):
            decode_es(cut)


def test_hard_truncation_is_truncated_error(small_es):
    # cut mid-sequence-header: bits run out with no valid recovery point
    with pytest.raises(TruncatedStreamError):
        decode_es(small_es[:6])


def test_corrupt_bytes_raise_stream_error_not_indexerror(small_es):
    rng = np.random.default_rng(3)
    data = bytearray(small_es)
    # corrupt a byte range inside the first slice's entropy-coded data
    start = small_es.index(b"\x00\x00\x01\x01") + 5
    for i in range(start, min(start + 40, len(data))):
        data[i] ^= rng.integers(1, 256)
    try:
        decode_es(bytes(data))
    except StreamError:
        pass  # typed failure is the contract
    except Exception as e:  # pragma: no cover
        pytest.fail(f"expected StreamError, got {type(e).__name__}: {e}")
    # silent success is also acceptable: corruption can decode to garbage
    # pixels without breaking syntax


def test_headers_out_of_order(small_es):
    # picture header with no preceding sequence header
    pic_at = small_es.index(b"\x00\x00\x01\x00")
    with pytest.raises(CorruptStreamError, match="sequence header"):
        decode_es(small_es[pic_at:])
    # slice start code with no preceding picture header
    sl_at = small_es.index(b"\x00\x00\x01\x01")
    with pytest.raises(CorruptStreamError, match="picture header"):
        decode_es(small_es[:pic_at] + small_es[sl_at:])


def test_stream_errors_are_valueerrors():
    """Compatibility: callers catching ValueError keep working."""
    assert issubclass(StreamError, ValueError)
    assert issubclass(TruncatedStreamError, StreamError)
    assert issubclass(CorruptStreamError, StreamError)
