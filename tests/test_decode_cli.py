"""mpeg-decode CLI: stream -> frames on disk, PSNR report."""

import os

import numpy as np
import pytest

from ec504_imageencoder_tpu import decode_cli
from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
from ec504_imageencoder_tpu.syntax import headers


@pytest.fixture(scope="module")
def clip(fixture_frames):
    return np.stack([fixture_frames["0"], fixture_frames["2"]])[:, :96, :128]


@pytest.fixture(scope="module")
def stream_path(clip, tmp_path_factory):
    enc = MPEG1IntraEncoder(quality=60, backend="numpy")
    path = tmp_path_factory.mktemp("dec") / "clip.mpeg"
    path.write_bytes(enc.encode(clip) + headers.sequence_end())
    return str(path)


def test_decode_to_ppm(stream_path, clip, tmp_path, capsys):
    outdir = str(tmp_path / "frames")
    rc = decode_cli.main([stream_path, "-o", outdir, "--format", "ppm"])
    assert rc == 0
    files = sorted(os.listdir(outdir))
    assert files == ["frame_0000.ppm", "frame_0001.ppm"]
    with open(os.path.join(outdir, "frame_0000.ppm"), "rb") as f:
        assert f.readline() == b"P6\n"
        w, h = map(int, f.readline().split())
        assert (w, h) == (clip.shape[2], clip.shape[1])
        f.readline()
        rgb = np.frombuffer(f.read(), np.uint8).reshape(h, w, 3)
    err = np.abs(rgb.astype(int) - clip[0].astype(int)).mean()
    assert err < 10.0, f"decoded frame far from source (mae {err:.1f})"


def test_decode_summary_only(stream_path, capsys):
    rc = decode_cli.main([stream_path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "decoded 2 frames" in out


def test_decode_rejects_empty(tmp_path):
    p = tmp_path / "empty.mpeg"
    p.write_bytes(b"\x00\x00\x01\xb7")  # sequence end only
    rc = decode_cli.main([str(p)])
    assert rc == 1
