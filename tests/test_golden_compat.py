"""Golden bitstream tests: byte-exactness against the reference C encoder.

The golden artifacts in tests/golden/ were produced by building the
reference (`make all`) and running it on its bundled fixtures
(images.zip: 30 progressive JPEGs = 3 unique frames x 10 copies).
"""

import hashlib
import json

import numpy as np
import pytest

from ec504_imageencoder_tpu.models.oracle import encode_compat
from ec504_imageencoder_tpu.syntax import headers


def test_oracle_matches_golden_mpeg(fixture_frames, frame_order, golden_mpeg):
    frames = [fixture_frames[k] for k in frame_order]
    mine, _ = encode_compat(frames, quality=12)
    assert len(mine) == len(golden_mpeg)
    assert mine == golden_mpeg


def test_oracle_bit_dumps_match_reference(fixture_frames, frame_order, golden_dir):
    frames = [fixture_frames[k] for k in frame_order]
    _, dumps = encode_compat(frames, quality=12)
    md5s = json.loads((golden_dir / "bit_dump_md5.json").read_text())
    for i, dump in enumerate(dumps):
        assert hashlib.md5(dump).hexdigest() == md5s[f"image_{i + 1}.bit"], i


def test_stream_prefix_headers(golden_mpeg):
    assert headers.pack_header(2202035) == golden_mpeg[:12]
    assert headers.system_header(2202035, 0xE6) == golden_mpeg[12:27]
    assert headers.pes_packet_header(1)[:4] == b"\x00\x00\x01\xe0"


def test_pes_headers_per_frame(golden_mpeg):
    """Each frame's PES header (minus the backpatched length) must rebuild."""
    import re

    offs = [m.start() for m in re.finditer(re.escape(b"\x00\x00\x01\xe0"), golden_mpeg)]
    assert len(offs) == 30
    for i, off in enumerate(offs):
        built = headers.pes_packet_header(1 + 3600 * i)
        gold = golden_mpeg[off : off + 16]
        assert built[:4] == gold[:4]
        assert built[6:] == gold[6:], f"frame {i} PTS/DTS"


def test_sequence_header_truncated_dims(golden_mpeg):
    """Q1: 400x600 must appear as 144x88 in the sequence header."""
    seq = headers.sequence_header(400 & 0xFF, 600 & 0xFF)
    idx = golden_mpeg.find(b"\x00\x00\x01\xb3")
    assert golden_mpeg[idx : idx + 12] == seq
    assert seq[4] == 0x09 and seq[6] == 0x58  # 144, 88


def test_compat_odd_width_matches_oracle(rng):
    """Odd-width frames: the reference reads chroma with half-width
    pointer math that a (2H, W//2) reshape can only mimic for even
    widths (r5 soak found the crash).  The flat-stride view must match
    the scalar oracle exactly."""
    from ec504_imageencoder_tpu.models.encoder import encode_compat
    from ec504_imageencoder_tpu.models.oracle import (
        encode_compat as oracle_encode,
    )

    for h, w, q in ((144, 97, 12), (197, 141, 56), (275, 163, 95)):
        frames = rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8)
        es_n, _ = encode_compat(frames, q, backend="numpy")
        es_o, _ = oracle_encode(frames, q)
        assert es_n == es_o, (h, w, q)
