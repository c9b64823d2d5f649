#!/usr/bin/env python3
"""Full benchmark matrix (BASELINE.json configs).

  1. fixture-folder compat encode -> byte-exactness gate + frames/s
  2. 640x480 quality sweep (q=1,4,8,...) with decoded PSNR
  3. 720p macroblock-row sharding within frames (rows mesh axis)
  4. 1080p frame-parallel batch, single host
  5. multi-GOP encode with checkpointed segments + stitching

Each config prints one JSON line; `python bench.py` remains the
single-line headline harness.  Pass --cpu to force the CPU backend
(virtual 8-device mesh for the sharded configs).
"""

import argparse
import json
import sys
import time
import pathlib

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def synthetic(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((np.sin(xx / 23) + np.cos(yy / 17)) * 60 + 128).astype(np.uint8)
    frames = np.broadcast_to(base[None, :, :, None], (b, h, w, 3)).copy()
    frames += rng.integers(0, 24, frames.shape, dtype=np.uint8)
    return frames


def timed_fps(enc, frames, reps=3):
    import jax
    import jax.numpy as jnp

    enc.encode(frames[:1])  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        enc.encode(frames)
        best = min(best, time.perf_counter() - t0)
    return len(frames) / best


def config1_compat():
    from ec504_imageencoder_tpu.models.encoder import encode_compat

    golden = (REPO / "tests/golden/awesome_video.mpeg").read_bytes()
    z = np.load(REPO / "tests/golden/fixture_rgb.npz")
    order = json.loads((REPO / "tests/golden/frame_order.json").read_text())["unique_ids"]
    frames = np.stack([z[k] for k in order])
    encode_compat(frames[:1], 12)  # compile
    t0 = time.perf_counter()
    out, _ = encode_compat(frames, 12)
    dt = time.perf_counter() - t0
    return {
        "config": "1:compat-fixtures",
        "bit_exact": out == golden,
        "frames_per_s_end_to_end": round(len(frames) / dt, 2),
    }


def config2_quality_sweep():
    from ec504_imageencoder_tpu.models.decoder import decode_es, psnr
    from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
    from ec504_imageencoder_tpu.syntax import headers

    frames = synthetic(4, 480, 640)
    rows = []
    for q in (1, 4, 8, 25, 50, 75, 95):
        enc = MPEG1IntraEncoder(quality=q)
        es = enc.encode(frames) + headers.sequence_end()
        dec = decode_es(es)
        rows.append({
            "q": q,
            "bytes_per_frame": len(es) // len(frames),
            "psnr_db": round(float(np.mean([psnr(frames[i], dec[i]) for i in range(len(dec))])), 2),
        })
    return {"config": "2:640x480-quality-sweep", "points": rows}


def config3_row_sharding():
    import jax

    from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
    from ec504_imageencoder_tpu.parallel import mesh as mesh_lib
    from ec504_imageencoder_tpu.parallel.sharded_encoder import ShardedMPEG1Encoder

    nd = len(jax.devices())
    frames = synthetic(2, 720, 1280)
    base = MPEG1IntraEncoder(quality=50)
    fps1 = timed_fps(base, frames)
    out = {"config": "3:720p-mb-row-sharding", "fps_1dev": round(fps1, 2)}
    if nd >= 2:
        rows_mesh = mesh_lib.make_mesh(n_data=1, n_rows=min(nd, 5))
        sharded = ShardedMPEG1Encoder(quality=50, mesh=rows_mesh)
        out["rows_axis"] = rows_mesh.shape[mesh_lib.ROWS_AXIS]
        out["fps_row_sharded"] = round(timed_fps(sharded, frames), 2)
        out["bytes_match"] = sharded.encode(frames) == base.encode(frames)
    return out


def config4_frame_parallel():
    import jax

    from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
    from ec504_imageencoder_tpu.parallel import mesh as mesh_lib
    from ec504_imageencoder_tpu.parallel.sharded_encoder import ShardedMPEG1Encoder

    nd = len(jax.devices())
    frames = synthetic(max(8, nd), 1080, 1920)
    base = MPEG1IntraEncoder(quality=50)
    out = {"config": "4:1080p-frame-parallel", "fps_1dev": round(timed_fps(base, frames), 2)}
    if nd >= 2:
        sharded = ShardedMPEG1Encoder(
            quality=50, mesh=mesh_lib.make_mesh(n_data=nd, n_rows=1)
        )
        fps_n = timed_fps(sharded, frames)
        out["n_devices"] = nd
        out["fps_ndev"] = round(fps_n, 2)
        out["scaling_efficiency"] = round(fps_n / (out["fps_1dev"] * nd), 3)
    return out


def config5_gop_stitch(tmp="/tmp/ec504_bench_gops"):
    import shutil

    from ec504_imageencoder_tpu.models.decoder import decode_es
    from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
    from ec504_imageencoder_tpu.runtime.checkpoint import encode_resumable

    shutil.rmtree(tmp, ignore_errors=True)
    frames = synthetic(24, 288, 352)
    enc = MPEG1IntraEncoder(quality=40, gop_size=6)
    t0 = time.perf_counter()
    n = encode_resumable(
        lambda s, e: frames[s:e], len(frames), tmp, tmp + "/out.mpeg", encoder=enc
    )
    dt = time.perf_counter() - t0
    ok = len(decode_es(open(tmp + "/out.mpeg", "rb").read())) == len(frames)
    return {
        "config": "5:checkpointed-gop-stitch",
        "frames": len(frames),
        "stream_bytes": n,
        "decodable": ok,
        "frames_per_s": round(len(frames) / dt, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    fns = {"1": config1_compat, "2": config2_quality_sweep,
           "3": config3_row_sharding, "4": config4_frame_parallel,
           "5": config5_gop_stitch}
    for c in args.configs.split(","):
        try:
            print(json.dumps(fns[c]()), flush=True)
        except Exception as e:
            print(json.dumps({"config": c, "error": str(e)}), flush=True)


if __name__ == "__main__":
    main()
