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


def config6_batch_curve():
    """fps/chip vs batch size on the device pipeline, measured with the
    sustained-scan method (G back-to-back steps inside one jitted
    program): the dev tunnel's 25-36 ms VARIABLE dispatch overhead makes
    single-dispatch minus-RTT numbers meaningless at ms-scale steps."""
    import jax
    import jax.numpy as jnp

    from ec504_imageencoder_tpu.models.mpeg1 import (
        correct_pipeline,
        quality_to_quant,
    )

    h, w = 1088, 1920
    intra_q, qscale = quality_to_quant(50)
    intra_dev = jax.device_put(intra_q)
    float(np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0))))  # warm
    points = []
    for b in (1, 2, 4, 8, 16):
        def gen(b=b):
            n = b * h * w * 3
            i = jax.lax.iota(jnp.uint32, n)
            x = i * jnp.uint32(2654435761)
            x = x ^ (x >> 15)
            x = x * jnp.uint32(2246822519)
            x = x ^ (x >> 13)
            return (x & jnp.uint32(0xFF)).astype(jnp.uint8).reshape(b, h, w, 3)

        frames = jax.jit(gen)()
        g = max(20, 128 // b)

        def scan_fn(frames, intra):
            def body(c, _):
                seg, bits = correct_pipeline(c, intra, qscale, 20480, xp=jnp)
                # consume seg or XLA dead-code-eliminates the pack (the
                # r4 methodology bug; see bench.py)
                bump = ((bits.sum()
                         + seg.ravel()[:256].astype(jnp.int32).sum())
                        & 0xFF).astype(jnp.uint8)
                return (c + bump).astype(jnp.uint8), bits[0, 0]

            _, hist = jax.lax.scan(body, frames, None, length=g)
            return hist

        sfn = jax.jit(scan_fn)
        sync = lambda o: float(np.asarray(jnp.sum(o.astype(jnp.float32))))
        sync(sfn(frames, intra_dev))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(sfn(frames, intra_dev))
            best = min(best, time.perf_counter() - t0)
        step = best / g
        points.append({"batch": b, "fps": round(b / step, 1),
                       "step_ms": round(step * 1e3, 2), "scan_len": g})
    return {"config": "6:1080p-batch-scaling-curve", "points": points}


def config7_mesh_scaling():
    """Mesh-shape sweep on the available device set: fps for (1,1), (8,1),
    (4,2), (2,4) (data, rows) meshes on a fixed 8x512x512 workload, with
    bit-identical output asserted across shapes.

    On the CI host the 8 'devices' are XLA virtual CPU devices sharing 2
    physical cores, so wall-clock cannot scale; the honest figure here is
    partitioning OVERHEAD (fps_mesh / fps_1dev on constant total work —
    1.0 means GSPMD added no communication/recompute).  On real multi-chip
    hardware the same sweep yields scaling efficiency directly
    (fps_mesh / (n_dev * fps_1dev))."""
    import jax

    from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
    from ec504_imageencoder_tpu.parallel import mesh as mesh_lib
    from ec504_imageencoder_tpu.parallel.sharded_encoder import ShardedMPEG1Encoder

    nd = len(jax.devices())
    frames = synthetic(8, 512, 512)
    base = MPEG1IntraEncoder(quality=50)
    fps1 = timed_fps(base, frames)
    golden = base.encode(frames)
    out = {"config": "7:mesh-shape-sweep", "n_devices": nd,
           "workload": "8x512x512 q=50", "fps_1dev": round(fps1, 2),
           "shapes": []}
    for n_data, n_rows in ((8, 1), (4, 2), (2, 4)):
        if n_data * n_rows > nd:
            continue
        enc = ShardedMPEG1Encoder(
            quality=50, mesh=mesh_lib.make_mesh(n_data=n_data, n_rows=n_rows)
        )
        fps = timed_fps(enc, frames)
        out["shapes"].append({
            "mesh": f"({n_data},{n_rows})",
            "fps": round(fps, 2),
            "overhead_ratio_vs_1dev": round(fps / fps1, 3),
            "scaling_efficiency_if_real_chips": round(fps / (nd * fps1), 3),
            "bytes_match": enc.encode(frames) == golden,
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--configs", default="1,2,3,4,5,6,7")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    fns = {"1": config1_compat, "2": config2_quality_sweep,
           "3": config3_row_sharding, "4": config4_frame_parallel,
           "5": config5_gop_stitch, "6": config6_batch_curve,
           "7": config7_mesh_scaling}
    for c in args.configs.split(","):
        try:
            print(json.dumps(fns[c]()), flush=True)
        except Exception as e:
            print(json.dumps({"config": c, "error": str(e)}), flush=True)


if __name__ == "__main__":
    main()
