"""Third-party decoder integration oracle.

SURVEY.md §4 prescribes "FFmpeg decode + PSNR as integration oracle" (the
reference's own verification was playing the file in FFmpeg-based players,
README.md:140).  ffmpeg isn't installed in this image, but OpenCV bundles
the same FFmpeg demux/decode stack — cv2.VideoCapture is a genuinely
independent MPEG-1 decoder, unlike models/decoder.py which shares this
repo's table code.

These tests gate:
  * structural compliance (frame count, dimensions parsed from our
    sequence header),
  * visual fidelity (PSNR vs the source through a decoder we didn't write),
  * the studio/full color-range semantics (standard decoders assume
    BT.601 limited range; full-range streams must show the predicted
    contrast stretch, not some other corruption).
"""

import numpy as np
import pytest

from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
from ec504_imageencoder_tpu.models.decoder import psnr
from ec504_imageencoder_tpu.syntax import headers

cv2 = pytest.importorskip("cv2")


def _decode_cv2(path: str) -> list[np.ndarray]:
    cap = cv2.VideoCapture(path)
    assert cap.isOpened(), "cv2/FFmpeg could not open the stream"
    frames = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        frames.append(img[:, :, ::-1].copy())  # BGR -> RGB
    cap.release()
    return frames


def _smooth_frames(n=3, h=64, w=96) -> np.ndarray:
    x = np.linspace(0, 255, w)[None, :, None]
    y = np.linspace(0, 255, h)[:, None, None]
    base = np.clip(0.7 * x + 0.3 * y, 0, 255)
    out = np.stack(
        [np.clip(base + 20.0 * np.sin(i / 2.0), 0, 255) for i in range(n)]
    ).astype(np.uint8)
    return np.repeat(out, 3, axis=-1)


def test_ffmpeg_decodes_stream_structure(tmp_path):
    frames = _smooth_frames(n=4)
    enc = MPEG1IntraEncoder(quality=70, backend="numpy", gop_size=2)
    path = str(tmp_path / "out.mpeg")
    enc.encode_to_file(frames, path)
    dec = _decode_cv2(path)
    assert len(dec) == len(frames)
    assert dec[0].shape == frames[0].shape


def test_ffmpeg_psnr_studio_range(tmp_path):
    """Studio-range encode must look right through a standard decoder."""
    frames = _smooth_frames(n=2)
    path = str(tmp_path / "studio.mpeg")
    MPEG1IntraEncoder(quality=85, backend="numpy").encode_to_file(frames, path)
    dec = _decode_cv2(path)
    for i in range(len(frames)):
        p = psnr(frames[i], dec[i])
        assert p > 34.0, f"frame {i}: third-party decode PSNR {p:.1f} dB"


def test_full_range_shows_contrast_stretch(tmp_path):
    """Full-range mode (reference semantics) decodes with the predicted
    limited-range misinterpretation — materially lower PSNR than studio."""
    frames = _smooth_frames(n=1)
    sp = str(tmp_path / "s.mpeg")
    fp = str(tmp_path / "f.mpeg")
    MPEG1IntraEncoder(quality=85, backend="numpy",
                      color_range="studio").encode_to_file(frames, sp)
    MPEG1IntraEncoder(quality=85, backend="numpy",
                      color_range="full").encode_to_file(frames, fp)
    ps = psnr(frames[0], _decode_cv2(sp)[0])
    pf = psnr(frames[0], _decode_cv2(fp)[0])
    assert ps > pf + 3.0, f"studio {ps:.1f} dB should beat full {pf:.1f} dB"


def test_quality_ladder_monotonic_bytes(tmp_path):
    """Higher quality -> more bytes and (through the third-party decoder)
    no worse PSNR, across the quality ladder."""
    frames = _smooth_frames(n=1)
    sizes, psnrs = [], []
    for q in (20, 50, 85):
        path = str(tmp_path / f"q{q}.mpeg")
        n = MPEG1IntraEncoder(quality=q, backend="numpy").encode_to_file(
            frames, path
        )
        sizes.append(n)
        psnrs.append(psnr(frames[0], _decode_cv2(path)[0]))
    assert sizes[0] < sizes[-1]
    assert psnrs[0] <= psnrs[-1] + 0.5  # allow decoder noise


def test_ffmpeg_decodes_program_stream(tmp_path):
    """The PS container (pack/system/PES mux) demuxes and decodes through
    cv2/FFmpeg — independent validation of the system layer, not just the
    video ES."""
    from ec504_imageencoder_tpu.syntax import mux

    frames = _smooth_frames(n=3)
    enc = MPEG1IntraEncoder(quality=80, backend="numpy", gop_size=2)
    es = enc.encode(frames)
    ps = mux.mux_program_stream(mux.split_es_pictures(es), fps=enc.fps)
    assert ps.endswith(mux.ISO11172_END)
    path = str(tmp_path / "out.mpg")
    with open(path, "wb") as f:
        f.write(ps)
    dec = _decode_cv2(path)
    assert len(dec) == len(frames)
    for i in range(len(frames)):
        p = psnr(frames[i], dec[i])
        assert p > 33.0, f"frame {i}: PS decode PSNR {p:.1f} dB"


def test_comparative_psnr_beats_reference(fixture_frames, frame_order, golden_dir):
    """BASELINE.md gate, comparative form: our correct-mode stream at the
    reference's own quality (q=12) must decode (same FFmpeg build) to
    materially higher PSNR than the reference's golden stream on the same
    inputs.  The reference decodes to ~7 dB under its most charitable
    source alignment (Q1 header truncation + Q4/Q5 AC loss); see
    benchmarks/rd_curve.py and RD_CURVE_r04.json."""
    frames = np.stack([fixture_frames[k] for k in frame_order])

    # reference golden stream through cv2/FFmpeg, best-effort alignment
    dec_ref = _decode_cv2(str(golden_dir / "awesome_video.mpeg"))
    assert len(dec_ref) == len(frames)
    ref_vals = []
    for i, d in enumerate(dec_ref):
        src = frames[i]
        h, w = d.shape[:2]
        cands = [src[:h, :w], np.transpose(src[:w, :h], (1, 0, 2))]
        ref_vals.append(max(psnr(c, d) for c in cands if c.shape == d.shape))
    ref_psnr = float(np.mean(ref_vals))

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/ours.mpeg"
        MPEG1IntraEncoder(quality=12, backend="numpy").encode_to_file(
            frames[:6], path
        )
        dec = _decode_cv2(path)
    ours = float(np.mean([psnr(frames[i], dec[i]) for i in range(len(dec))]))
    assert ours >= ref_psnr + 10.0, (
        f"ours {ours:.1f} dB vs reference {ref_psnr:.1f} dB"
    )
