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
BATCH = int(os.environ.get("EC504_BENCH_BATCH", "4"))
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

    intra_q, qscale = quality_to_quant(QUALITY)
    # noise frames at q=50 run ~132 kbit/slice; 16384 B (131072 bits) would
    # silently truncate the largest slices, so give the benchmark headroom
    max_slice_bytes = 20480

    fn = _jitted_correct_pipeline(qscale, max_slice_bytes)

    # NOTE: timing must force execution by FETCHING data — on the axon
    # dev backend block_until_ready returns before the work runs.
    def sync(out):
        return float(np.asarray(jnp.sum(out[1].astype(jnp.float32))))

    # Generate the frame batch ON DEVICE: the dev tunnel uploads ~25 MB of
    # host frames at O(minutes), and the metric is the device pipeline on
    # device-resident frames anyway (BASELINE.md separates host decode).
    t0 = time.perf_counter()
    gen = jax.jit(
        lambda: jax.random.randint(
            jax.random.PRNGKey(0), (BATCH, PAD_H, W1080, 3), 0, 256, jnp.int32
        ).astype(jnp.uint8)
    )
    frames_dev = gen()
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
    step = max(min(times) - rtt, 1e-6)

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
        "fps": BATCH / step,
        "step_s": step,
        "sync_rtt_s": rtt,
        # time to jitted on-device RNG frame generation (not an upload --
        # the metric excludes host->device transfer by design, see module
        # docstring)
        "input_ready_s": t_input,
        "compile_s": t_compile,
        "stream_bytes_per_frame": total_bytes // BATCH,
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
    print(json.dumps({"reference": ref, "tpu": tpu}), file=sys.stderr)


if __name__ == "__main__":
    main()
