"""Bounded-memory streaming intake (SURVEY.md §5: stream input frames in
bounded batches instead of load-all)."""

import numpy as np
import pytest

from ec504_imageencoder_tpu.io import jpeg as jpeg_io
from ec504_imageencoder_tpu.io.stream import FolderFrameSource


@pytest.fixture()
def jpeg_folder(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    for i in range(7):
        arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"f{i:02d}.jpg", quality=92)
    return tmp_path


def test_stream_matches_load_folder(jpeg_folder):
    full, names = jpeg_io.load_folder(str(jpeg_folder))
    src = FolderFrameSource(str(jpeg_folder))
    assert len(src) == len(full)
    assert (src.height, src.width) == full.shape[1:3]
    np.testing.assert_array_equal(src(0, len(src)), full)


def test_stream_batches_cover_everything_in_order(jpeg_folder):
    full, _ = jpeg_io.load_folder(str(jpeg_folder))
    src = FolderFrameSource(str(jpeg_folder))
    got, starts = [], []
    for start, batch in src.batches(3):
        starts.append(start)
        assert len(batch) <= 3
        got.append(batch)
    assert starts == [0, 3, 6]
    np.testing.assert_array_equal(np.concatenate(got), full)


def test_stream_random_access_windows(jpeg_folder):
    full, _ = jpeg_io.load_folder(str(jpeg_folder))
    src = FolderFrameSource(str(jpeg_folder))
    np.testing.assert_array_equal(src(2, 5), full[2:5])
    np.testing.assert_array_equal(src(5, 99), full[5:])


def test_stream_fail_fast_on_bad_file(jpeg_folder):
    (jpeg_folder / "zz_bad.jpg").write_bytes(b"\xff\xd8\xff notajpeg")
    src = FolderFrameSource(str(jpeg_folder))
    with pytest.raises(ValueError, match="fail-fast|decode"):
        src(0, len(src))


def test_stream_encode_matches_full_load(jpeg_folder):
    """CLI-equivalent flow: chunked streaming encode == one-shot encode."""
    from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
    from ec504_imageencoder_tpu.syntax import headers

    full, _ = jpeg_io.load_folder(str(jpeg_folder))
    enc = MPEG1IntraEncoder(quality=45, backend="numpy", gop_size=4)
    ref = enc.encode(full) + headers.sequence_end()

    src = FolderFrameSource(str(jpeg_folder))
    chunks = [enc.encode(b, first_frame_index=s) for s, b in src.batches(3)]
    assert b"".join(chunks) + headers.sequence_end() == ref


def test_stream_plugs_into_checkpointed_encode(jpeg_folder, tmp_path):
    from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
    from ec504_imageencoder_tpu.runtime.checkpoint import encode_resumable
    from ec504_imageencoder_tpu.syntax import headers

    full, _ = jpeg_io.load_folder(str(jpeg_folder))
    enc = MPEG1IntraEncoder(quality=45, backend="numpy", gop_size=4)
    ref = enc.encode(full) + headers.sequence_end()

    src = FolderFrameSource(str(jpeg_folder))
    out = str(tmp_path / "out.mpeg")
    enc2 = MPEG1IntraEncoder(quality=45, backend="numpy", gop_size=4)
    encode_resumable(src, len(src), str(tmp_path / "wd"), out, encoder=enc2)
    assert open(out, "rb").read() == ref


def test_streaming_error_surface_is_valueerror(tmp_path, rng):
    """Fail-fast contract: corrupt files anywhere in the folder —
    including paths[0], whose probe runs in the constructor — surface as
    ValueError, not decoder-internal exception types (r5 soak found a
    raw PIL.UnidentifiedImageError leaking from the probe)."""
    from PIL import Image

    from ec504_imageencoder_tpu.io.stream import FolderFrameSource

    for i in range(3):
        img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(str(tmp_path / f"f{i}.jpg"),
                                  quality=85, subsampling=2)
    (tmp_path / "f1.jpg").write_bytes(b"\xff\xd8garbage")
    src = FolderFrameSource(str(tmp_path))
    src.paths.sort()
    with pytest.raises(ValueError):
        for _ in src.plane_batches(2):
            pass
    with pytest.raises(ValueError):
        for _ in src.batches(2):
            pass
    # corrupt FIRST file: constructor probe must raise ValueError too
    (tmp_path / "f0.jpg").write_bytes(b"\xff\xd8garbage")
    with pytest.raises(ValueError):
        FolderFrameSource(str(tmp_path))
