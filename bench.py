#!/usr/bin/env python3
"""Benchmark harness.

Headline metric (BASELINE.json): encoded frames/s/chip at 1080p, measured
on the correct-mode device pipeline with device-resident frames (the
dev-container TPU is reached through a slow relay tunnel, so host<->device
transfer is timed separately and excluded from the kernel number, as the
survey prescribes: "separating JPEG-decode (host) from encode (device)").

vs_baseline: the reference C encoder is re-built and re-run on its fixture
workload per run (BASELINE.md demands re-measurement, the reference
publishes no numbers).  The reference only ever encodes a hard 96x144
crop (SURVEY.md Q2), so its frames/s is converted to an area-normalized
1080p-equivalent rate for comparison.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
"""

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

REF_SRC = "/root/reference"
REF_BUILD = "/tmp/ec504_bench_ref"

W1080, H1080 = 1920, 1080
PAD_H = 1088  # 1080 padded to MB multiple
# batch 16 is the chip's preferred operating point (honest r5 batch
# curve; note the r4 curve in BENCHMATRIX_r04 was DCE-inflated)
BATCH = int(os.environ.get("EC504_BENCH_BATCH", "16"))
QUALITY = 50
ITERS = int(os.environ.get("EC504_BENCH_ITERS", "5"))

_T0 = time.time()


def _log(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def measure_reference() -> dict:
    """Build + run the reference C encoder on its fixtures; frames/s."""
    try:
        if not os.path.exists(os.path.join(REF_BUILD, "encoder")):
            shutil.rmtree(REF_BUILD, ignore_errors=True)
            shutil.copytree(REF_SRC, REF_BUILD)
            subprocess.run(["make", "all"], cwd=REF_BUILD, check=True,
                           capture_output=True)
            subprocess.run(["unzip", "-q", "images.zip", "-d", "imgdir"],
                           cwd=REF_BUILD, check=True)
            os.makedirs(os.path.join(REF_BUILD, "images"), exist_ok=True)
            for f in os.listdir(os.path.join(REF_BUILD, "imgdir")):
                shutil.copy(os.path.join(REF_BUILD, "imgdir", f),
                            os.path.join(REF_BUILD, "images", f))
        os.makedirs(os.path.join(REF_BUILD, "bitstreams"), exist_ok=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            subprocess.run(["./encoder"], cwd=REF_BUILD, check=True,
                           stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            best = min(best, time.perf_counter() - t0)
        n_frames = 30
        fps_crop = n_frames / best
        # area-normalize the 96x144 crop to a 1080p frame
        fps_1080_equiv = fps_crop * (96 * 144) / (W1080 * PAD_H)
        return {"wall_s": best, "fps_crop": fps_crop,
                "fps_1080_equiv": fps_1080_equiv}
    except Exception as e:  # reference unavailable: report absolute only
        return {"error": str(e), "fps_1080_equiv": None}


def measure_tpu_1080p() -> dict:
    import jax
    import jax.numpy as jnp

    from ec504_imageencoder_tpu.models.mpeg1 import (
        _jitted_correct_pipeline,
        quality_to_quant,
    )

    _log(f"jax imported; discovering devices (slow over the dev tunnel)")
    dev = jax.devices()[0]
    _log(f"device: {dev}")

    # Warm the runtime: the FIRST compile+fetch in a process pays a huge
    # variable tunnel cost (measured 60-470 s for a trivial program) that
    # r3 mis-attributed to input generation; pay it here, attributed.
    t0 = time.perf_counter()
    float(np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0))))
    t_warm = time.perf_counter() - t0
    _log(f"runtime warm (first compile+fetch) in {t_warm:.1f}s")

    intra_q, qscale = quality_to_quant(QUALITY)
    # the encoder's own auto sizing (initial_slice_bytes) — no hand-picked
    # headroom; worst-case noise at q=50 fits (~132 kbit/slice measured vs
    # the ~184 kbit budget), and the assert below still guards truncation
    from ec504_imageencoder_tpu.models.mpeg1 import initial_slice_bytes

    max_slice_bytes = initial_slice_bytes(QUALITY, W1080 // 16)

    fn = _jitted_correct_pipeline(qscale, max_slice_bytes)

    # NOTE: timing must force execution by FETCHING data — on the axon
    # dev backend block_until_ready returns before the work runs.
    def sync(out):
        return float(np.asarray(jnp.sum(out[1].astype(jnp.float32))))

    # Generate the frame batch ON DEVICE: the dev tunnel uploads ~25 MB of
    # host frames at O(minutes), and the metric is the device pipeline on
    # device-resident frames anyway (BASELINE.md separates host decode).
    # A multiply-xorshift hash of an iota replaces jax.random here: the
    # threefry program took ~10 min to build+run over the tunnel in the
    # r3 bench (input_ready_s = 586), the hash is a handful of elementwise
    # ops with the same white-noise worst-case content.
    t0 = time.perf_counter()

    def hash_frames():
        n = BATCH * PAD_H * W1080 * 3
        i = jax.lax.iota(jnp.uint32, n)
        x = i * jnp.uint32(2654435761)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(2246822519)
        x = x ^ (x >> 13)
        return (x & jnp.uint32(0xFF)).astype(jnp.uint8).reshape(
            BATCH, PAD_H, W1080, 3
        )

    frames_dev = jax.jit(hash_frames)()
    intra_dev = jax.device_put(intra_q)
    _ = np.asarray(frames_dev[0, 0, 0]), np.asarray(intra_dev[0, 0])
    t_input = time.perf_counter() - t0
    _log(f"device input ready in {t_input:.1f}s; compiling pipeline")

    t0 = time.perf_counter()
    out = fn(frames_dev, intra_dev)
    sync(out)
    t_compile = time.perf_counter() - t0
    _log(f"compiled + first run in {t_compile:.1f}s")

    # measure the dispatch+fetch floor so it can be subtracted
    tiny = jax.jit(lambda x: x + 1.0)
    tiny_in = jax.device_put(np.float32(1.0))
    float(np.asarray(tiny(tiny_in)))
    t0 = time.perf_counter()
    for _ in range(3):
        float(np.asarray(tiny(tiny_in)))
    rtt = (time.perf_counter() - t0) / 3

    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        out = fn(frames_dev, intra_dev)
        sync(out)
        times.append(time.perf_counter() - t0)
        _log(f"iter {i + 1}/{ITERS}: {times[-1]:.3f}s")

    # Sustained throughput: G back-to-back batches inside ONE jitted
    # program (lax.scan with a data dependency between steps).  This is
    # the production continuous-encode pattern and the only reliable
    # timing on this relay tunnel: per-dispatch overhead is 25-36 ms and
    # VARIES by more than the 5-7 ms step itself, so single-dispatch
    # minus-RTT numbers are garbage (they have gone negative).  With
    # G=100 the dispatch overhead is <1% of the program.
    from ec504_imageencoder_tpu.models.mpeg1 import correct_pipeline

    G = int(os.environ.get("EC504_BENCH_SCAN", "100"))

    def sustained(frames, intra):
        def body(c, _):
            seg, bits = correct_pipeline(c, intra, qscale, max_slice_bytes,
                                         xp=jnp)
            # the bump MUST consume seg: r1-r4 bumped from `bits` alone,
            # which derives from the length cumsum — XLA dead-code-
            # eliminated the entire pack placement and inflated the
            # sustained figure ~4x (r4's 1196 fps was really ~270)
            bump = ((bits.sum()
                     + seg.ravel()[:256].astype(jnp.int32).sum())
                    & 0xFF).astype(jnp.uint8)
            return (c + bump).astype(jnp.uint8), bits[0, 0]
        c, hist = jax.lax.scan(body, frames, None, length=G)
        return c, hist

    sfn = jax.jit(sustained)
    sout = sfn(frames_dev, intra_dev)
    sync((None, sout[1]))  # compile + first run
    sus_times = []
    for i in range(3):
        t0 = time.perf_counter()
        sout = sfn(frames_dev, intra_dev)
        sync((None, sout[1]))
        sus_times.append(time.perf_counter() - t0)
        _log(f"sustained {i + 1}/3: {sus_times[-1]:.3f}s for {G} steps")
    sus_step = max((min(sus_times) - rtt) / G, 1e-6)

    bits = np.asarray(out[1])
    # correct_pipeline itself has no overflow guard (only the encoder API
    # raises); fail loudly rather than report bit counts from truncated
    # slices if content ever exceeds the hand-picked headroom
    assert int(bits.max()) <= 8 * max_slice_bytes, (
        f"slice overflow: {int(bits.max())} bits > {8 * max_slice_bytes}"
    )
    total_bytes = int(((bits + 7) // 8).sum())
    return {
        "device": str(jax.devices()[0]),
        "fps": BATCH / sus_step,
        "fps_sustained": BATCH / sus_step,
        "step_s": sus_step,
        # methodology marker: r1-r3 keyed "fps"/"step_s" to single-dispatch
        # minus-RTT; r4 used a sustained scan whose bump consumed only the
        # bit counts, letting XLA dead-code-eliminate the pack kernel
        # (inflating the figure ~4x).  Since r5 the scan consumes the
        # segment bytes too — compare only like methods across rounds.
        "method": "sustained_scan_consume_all",
        # raw single-dispatch wall time (includes the 25-36 ms variable
        # tunnel dispatch+fetch overhead; kept for context, not a metric)
        "dispatch_iter_min_s": min(times),
        "scan_len": G,
        "sync_rtt_s": rtt,
        "runtime_warm_s": t_warm,
        # time to jitted on-device frame generation (not an upload -- the
        # metric excludes host->device transfer by design, see module
        # docstring)
        "input_ready_s": t_input,
        "compile_s": t_compile,
        "stream_bytes_per_frame": total_bytes // BATCH,
    }


E2E_DIR = "/tmp/ec504_bench_1080p_jpegs"
E2E_FRAMES = int(os.environ.get("EC504_BENCH_E2E_FRAMES", "48"))


def _stage_e2e_jpegs(n: int) -> str:
    """Write n synthetic 1080p JPEGs once (cached across runs)."""
    import cv2

    os.makedirs(E2E_DIR, exist_ok=True)
    have = [f for f in os.listdir(E2E_DIR) if f.endswith(".jpg")]
    if len(have) >= n:
        return E2E_DIR
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H1080, 0:W1080]
    for i in range(n):
        base = ((np.sin(xx / 23 + i) + np.cos(yy / 17)) * 60 + 128)
        img = np.clip(
            base[:, :, None] + rng.integers(0, 24, (H1080, W1080, 3)), 0, 255
        ).astype(np.uint8)
        cv2.imwrite(os.path.join(E2E_DIR, f"frame_{i:04d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
    return E2E_DIR


def measure_end_to_end() -> dict:
    """JPEG folder -> .mpeg wall-clock fps with the stages overlapped:
    threaded host entropy-decode+IDCT to YCbCr planes (FolderFrameSource
    lookahead), async device_put upload, device encode from planes,
    bucketed fetch of the used slice prefixes.  Replaces the reference's
    host-only load-all pipeline (encoder.h:126-171, stb_image.h:2430-2523).

    The planes intake (io/jpeg.decode_planes_batch + encode_from_planes)
    skips the JPEG back-half's resample/color on the host AND the
    encoder's color/subsample on device, and uploads 1.5 bytes/px
    instead of RGB's 3 — on this dev setup the TPU sits behind a relay
    tunnel, so wire bytes are the end-to-end bottleneck and the
    component timings are reported so that is attributable."""
    import jax

    from ec504_imageencoder_tpu.io.stream import FolderFrameSource
    from ec504_imageencoder_tpu.models.mpeg1 import (
        MPEG1IntraEncoder,
        _jitted_planes_pipeline,
        pad_planes_to_macroblocks,
    )
    from ec504_imageencoder_tpu.syntax import headers

    folder = _stage_e2e_jpegs(E2E_FRAMES)
    src = FolderFrameSource(folder)
    n = len(src)
    if not src.supports_planes():
        return {"error": "planes intake unsupported for staged JPEGs"}

    enc = MPEG1IntraEncoder(quality=QUALITY)
    msb = enc.resolve_slice_bytes(W1080 // 16)
    fn = _jitted_planes_pipeline(enc.qscale, msb, enc.dct_impl)
    intra_dev = jax.device_put(enc.intra_q)

    import jax as _jax

    from ec504_imageencoder_tpu.ops.bitpack import (
        compact_slices,
        split_compact_slices,
    )

    compact_jit = _jax.jit(compact_slices, static_argnums=2)
    # fixed compaction capacity (device scratch, fetched only up to the
    # used words) so the 1088-step scan compiles ONCE, outside the timed
    # loop — a per-batch cap bucket recompiled through the tunnel and
    # dominated the first r5 e2e attempt
    mbh = PAD_H // 16
    cap = 1 << (BATCH * mbh * (msb // 4) + msb // 4 - 1).bit_length()

    # compile + warm outside the timed loop
    warm = (np.zeros((BATCH, PAD_H, W1080), np.uint8),
            np.zeros((BATCH, PAD_H // 2, W1080 // 2), np.uint8),
            np.zeros((BATCH, PAD_H // 2, W1080 // 2), np.uint8))
    wd = [jax.device_put(p) for p in warm]
    wout = fn(*wd, intra_dev)
    _ = np.asarray(wout[1])
    _ = np.asarray(compact_jit(wout[0], wout[1], cap)[0][:8])  # compile
    del warm, wd, wout

    # component: host decode only (entropy + IDCT, planes out)
    t0 = time.perf_counter()
    planes0 = src.planes(0, min(BATCH, n))
    t_decode_batch = time.perf_counter() - t0

    # component: upload only (async dispatch + block)
    padded0 = pad_planes_to_macroblocks(*planes0)
    up_bytes = sum(p.nbytes for p in padded0)
    t0 = time.perf_counter()
    dev = [jax.device_put(p) for p in padded0]
    for d in dev:
        d.block_until_ready()
    t_upload_batch = time.perf_counter() - t0

    out = bytearray()
    t_wait = [0.0]
    t_fetch = [0.0]
    t0 = time.perf_counter()
    pending = None  # (start, nframes, device result)

    def drain(p):
        start, k, res = p
        tw = time.perf_counter()
        bits = np.asarray(res[1])   # blocks until this batch's upload +
        tmid = time.perf_counter()  # encode finish (the pipeline wait)
        t_wait[0] += tmid - tw
        # then a device-side compaction so D2H carries ~stream bytes,
        # not the padded slice buffers (35 MB for a 2.3 MB stream)
        total_w = int(((bits + 31) // 32).sum())
        dense, _ = compact_jit(res[0], res[1], cap)
        # bucket the fetch length: a distinct slice shape per batch
        # would recompile the slice executable through the tunnel
        fetch_w = min(-(-total_w // 65536) * 65536, cap)
        rows = split_compact_slices(np.asarray(dense[:fetch_w]), bits)
        t_fetch[0] += time.perf_counter() - tmid
        out.extend(enc.assemble(rows, bits, W1080, H1080, start))

    for start, planes in src.plane_batches(BATCH):
        dev = [jax.device_put(p)
               for p in pad_planes_to_macroblocks(*planes)]  # async upload
        res = fn(*dev, intra_dev)                            # async dispatch
        if pending is not None:
            drain(pending)                                   # overlap host work
        pending = (start, planes[0].shape[0], res)
    drain(pending)
    out.extend(headers.sequence_end())
    wall = time.perf_counter() - t0
    with open("/tmp/ec504_bench_e2e.mpeg", "wb") as f:
        f.write(out)
    # untimed validation: the stream must decode, and quality must be
    # sane vs the decoded source (our own spec decoder; no ffmpeg here)
    try:
        from ec504_imageencoder_tpu.models.decoder import (
            decode_es_fast,
            psnr,
        )
        from ec504_imageencoder_tpu.ops.jpeg_tpu import (
            decode_rgb_from_planes,
        )

        dec = decode_es_fast(bytes(out))
        srcp = src.planes(0, 1)
        src_rgb = decode_rgb_from_planes(*(p[0] for p in srcp), np)
        check = {
            "frames_decoded": len(dec),
            "psnr_frame0_db": round(float(psnr(src_rgb, dec[0])), 2),
        }
    except Exception as e:  # diagnostics only
        check = {"error": f"{type(e).__name__}: {e}"}
    return {
        "validation": check,
        "frames": n,
        "fps_end_to_end": n / wall,
        "wall_s": wall,
        "intake": "ycbcr420_planes",
        "decode_fps_host": len(planes0[0]) / t_decode_batch,
        "decode_s_per_batch": t_decode_batch,
        "upload_s_per_batch": t_upload_batch,
        "upload_mbytes_per_batch": round(up_bytes / 1e6, 1),
        "pipeline_wait_s_total": round(t_wait[0], 3),
        "fetch_s_total": round(t_fetch[0], 3),
        "stream_bytes": len(out),
    }


def main() -> None:
    _log("building + timing reference C encoder")
    ref = measure_reference()
    _log(f"reference: {ref}")
    try:
        tpu = measure_tpu_1080p()
    except Exception as e:
        # Safety net: a kernel variant that fails to lower on the real
        # chip must degrade the number, not zero the round.  The knobs
        # are trace-time, so fall back by re-execing with a simpler
        # pipeline variant selected.
        chain = {"": ("noBE", {"EC504_PACK_BE": "0"}),
                 "noBE": ("kfuse0", {"EC504_KFUSE": "0"}),
                 "kfuse0": ("generic", {"EC504_VLC": "generic"})}
        nxt = chain.get(os.environ.get("EC504_BENCH_FALLBACK", ""))
        if nxt is None:
            raise
        _log(f"device pipeline failed ({type(e).__name__}: {e}); "
             f"falling back with {nxt[1]}")
        env = dict(os.environ, EC504_BENCH_FALLBACK=nxt[0], **nxt[1])
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)], env)
    e2e = {}
    if os.environ.get("EC504_BENCH_E2E", "1") == "1":
        try:
            _log("measuring end-to-end JPEG folder -> .mpeg")
            e2e = measure_end_to_end()
            _log(f"end_to_end: {e2e}")
        except Exception as e:  # e2e is auxiliary; never zero the headline
            e2e = {"error": f"{type(e).__name__}: {e}"}
            _log(f"end-to-end measurement failed: {e2e['error']}")
    value = tpu["fps"]
    base = ref.get("fps_1080_equiv")
    vs = (value / base) if base else None
    print(json.dumps({
        "metric": "1080p intra encode frames/s/chip (device pipeline)",
        "value": round(value, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 1) if vs is not None else None,
    }))
    # diagnostics on stderr so stdout stays a single JSON line
    print(json.dumps({"reference": ref, "tpu": tpu, "end_to_end": e2e}),
          file=sys.stderr)


if __name__ == "__main__":
    main()
