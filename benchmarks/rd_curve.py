#!/usr/bin/env python3
"""Rate-distortion curve + comparative PSNR gate vs the reference encoder.

BASELINE.md's distortion gate is comparative — "decoded PSNR (FFmpeg) >=
reference" — so this harness decodes BOTH encoders' outputs through the
same third-party decoder (cv2's bundled FFmpeg stack) on the same fixture
inputs and measures PSNR against the source:

  * reference: the golden `awesome_video.mpeg` produced by the reference
    binary (committed, byte-exact reproducible via compat mode).  Its
    sequence header claims 144x88 (Q1 dimension truncation) while the
    encoded content is a 96x144 source crop scanned column-band-wise
    (Q2/Q3), and the stream drops AC sign bits + truncates runs (Q4/Q5)
    — FFmpeg decodes it with "ac-tex damaged" errors.  PSNR is taken as
    the best over the plausible source alignments, which is charitable.
  * this repo: correct-mode streams across the quality ladder, decoded
    by the same FFmpeg build, PSNR vs the full source frames.

Output: one JSON document (commit as RD_CURVE_r{N}.json) with the curve
(bytes/frame vs dB for q=1..95) and the comparative gate result.

Runs on CPU: python benchmarks/rd_curve.py
"""

import json
import pathlib
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUALITIES = (1, 5, 12, 25, 40, 50, 65, 75, 85, 95)


def decode_cv2(path: str):
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return []
    frames = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        frames.append(img[:, :, ::-1].copy())
    cap.release()
    return frames


def psnr(a, b) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10.0 * np.log10(255.0 ** 2 / mse)


def reference_psnr(frames_by_id, order):
    """Best-effort PSNR of the golden reference stream via FFmpeg."""
    golden = str(REPO / "tests/golden/awesome_video.mpeg")
    dec = decode_cv2(golden)
    if not dec:
        return {"decodable": False}
    vals = []
    for i, d in enumerate(dec):
        src = frames_by_id[order[i % len(order)]] if i < len(order) * 10 else None
        if src is None:
            continue
        h, w = d.shape[:2]                      # 88 x 144 (Q1 header)
        cands = [
            src[:h, :w],                        # top-left crop at header dims
            np.transpose(src[:w, :h], (1, 0, 2)),  # transposed 144x88 region
            src[:144, :96][:h, :w],             # the actually-encoded crop
        ]
        vals.append(max(psnr(c, d) for c in cands if c.shape == d.shape))
    return {
        "decodable": True,
        "frames": len(dec),
        "decoded_dims": list(dec[0].shape[:2]),
        "psnr_db_best_alignment": round(float(np.mean(vals)), 2),
        "ffmpeg_errors": "ac-tex damaged / invalid mb type (known Q4/Q5 bugs)",
    }


def run_curve(frames, qualities=QUALITIES, cross_check=False):
    """Encode the ladder, decode via cv2/FFmpeg (+ optionally our fast
    verification decoder), PSNR vs source."""
    from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder

    curve = []
    with tempfile.TemporaryDirectory() as td:
        for q in qualities:
            print(f"[rd] q={q} {frames.shape}", file=sys.stderr, flush=True)
            enc = MPEG1IntraEncoder(quality=q, backend="numpy")
            path = f"{td}/q{q}.mpeg"
            nbytes = enc.encode_to_file(frames, path)
            dec = decode_cv2(path)
            ps = [psnr(frames[i], dec[i]) for i in range(len(dec))]
            point = {
                "q": q,
                "bytes_per_frame": nbytes // len(frames),
                "psnr_db": round(float(np.mean(ps)), 2),
                "frames_decoded": len(dec),
            }
            if cross_check:
                # our own spec-derived decoder (models/decoder.py fast
                # path) — validates the quality claim at this resolution
                # independently of FFmpeg's error concealment
                from ec504_imageencoder_tpu.models.decoder import (
                    decode_es_fast,
                )

                ours = decode_es_fast(open(path, "rb").read())
                ps2 = [psnr(frames[i], ours[i]) for i in range(len(ours))]
                point["psnr_db_own_decoder"] = round(float(np.mean(ps2)), 2)
            curve.append(point)
    return curve


def make_1080p(frames):
    """Tile the 400x600 fixture content to 1920x1080 (real image
    statistics at the production operating point, not noise)."""
    b, h, w = frames.shape[:3]
    ty, tx = -(-1080 // h), -(-1920 // w)
    big = np.tile(frames, (1, ty, tx, 1))[:, :1080, :1920]
    return np.ascontiguousarray(big)


def main():
    import json as _json

    z = np.load(REPO / "tests/golden/fixture_rgb.npz")
    order = _json.loads(
        (REPO / "tests/golden/frame_order.json").read_text()
    )["unique_ids"]
    frames_by_id = {k: z[k] for k in order}
    frames = np.stack([frames_by_id[k] for k in order])  # 3 unique 600x400

    ref = reference_psnr(frames_by_id, order)

    curve = run_curve(frames)
    uniq = np.stack([frames_by_id[k] for k in dict.fromkeys(order)])
    frames_1080 = make_1080p(uniq)  # 3 unique frames at 1080p
    curve_1080 = run_curve(frames_1080, qualities=(12, 25, 50, 75, 95),
                           cross_check=True)

    ours_q12 = next(c for c in curve if c["q"] == 12)
    q12_1080 = next(c for c in curve_1080 if c["q"] == 12)
    gate = {
        "reference_psnr_db": ref.get("psnr_db_best_alignment"),
        "ours_q12_psnr_db": ours_q12["psnr_db"],
        "ours_q12_psnr_db_1080p": q12_1080["psnr_db"],
        "ours_beats_reference": (
            ref.get("psnr_db_best_alignment") is None
            or ours_q12["psnr_db"] >= ref["psnr_db_best_alignment"]
        ),
        "ours_beats_reference_1080p": (
            ref.get("psnr_db_best_alignment") is None
            or q12_1080["psnr_db"] >= ref["psnr_db_best_alignment"]
        ),
    }
    print(json.dumps({
        "inputs": "3 unique 400x600 fixture frames (stb-decoded golden RGB)",
        "inputs_1080p": "same content tiled to 1920x1080 (production "
                        "operating point; r4 VERDICT item 6)",
        "decoder": "cv2 (bundled FFmpeg), independent of this repo; "
                   "1080p points cross-checked by models/decoder.py "
                   "decode_es_fast",
        "reference_stream": ref,
        "comparative_gate": gate,
        "rd_curve": curve,
        "rd_curve_1080p": curve_1080,
    }, indent=1))


if __name__ == "__main__":
    main()
