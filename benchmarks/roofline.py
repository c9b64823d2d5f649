#!/usr/bin/env python3
"""Per-stage roofline accounting for the correct-mode 4x1080p pipeline.

Times each pipeline stage as its own jitted program on the attached TPU
and pairs the measurement with an analytic minimum-HBM-traffic figure, so
the distance to the bandwidth floor is explicit per stage (VERDICT r3
item 1).  Stage boundaries match the production pipeline in
models/mpeg1.py (_tpu_pipeline_from_planes):

  color      packed-u32 colorspace + 4:2:0 subsample
  blockize   u8 relayout into the kernels' px-major (R, 64, NB) layout
  vlc        fused Pallas kernel (DCT+quant+zigzag+DC pred+VLC+4:1 fuse)
  transpose  fused-slot stream transposition (XLA relayout)
  pack       fused4 Pallas pack, in-kernel byte combine (emit_be)
  serialize  words -> bytes bitcast + header OR

Caveats: stage-sliced timing forces intermediates to HBM at every cut, so
the sum of stages is an upper bound on the fused pipeline's time (XLA
fuses color into fewer passes inside the full program); the "full"
row is the authoritative end-to-end step.  Output: one JSON document
(commit as ROOFLINE_r{N}.json) plus a markdown table on stderr for
ARCHITECTURE.md.

Run on the chip: python benchmarks/roofline.py
"""

import json
import os
import sys
import time
import pathlib

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

B, H, W = int(os.environ.get("EC504_BENCH_BATCH", "4")), 1088, 1920
MSB = 20480          # max_slice_bytes (bench headroom value)
QUALITY = 50
ITERS = 5
HBM_GBS = float(os.environ.get("EC504_HBM_GBS", "819"))  # v5e ~819 GB/s

MB = 1024 * 1024


def main():
    import jax
    import jax.numpy as jnp

    from ec504_imageencoder_tpu.models.mpeg1 import (
        _jitted_correct_pipeline,
        quality_to_quant,
    )
    from ec504_imageencoder_tpu.ops.bitpack import words_be_to_bytes
    from ec504_imageencoder_tpu.ops.color import (
        pack_rgbx_u32,
        rgb_to_ycbcr_packed,
        subsample_420,
    )
    from ec504_imageencoder_tpu.ops.pallas_pack import pack_words_fused4_core
    from ec504_imageencoder_tpu.ops.pallas_vlc import (
        fused_stack_to_stream,
        vlc_fused_slots_from_blocks_tpu,
    )

    mbh, mbw = H // 16, W // 16
    nb = mbw * 6
    r = B * mbh
    intra_q, qscale = quality_to_quant(QUALITY)
    qw = (intra_q.astype(np.int32) * qscale)

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    # warm the runtime (first compile+fetch pays a big tunnel cost)
    float(np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0))))

    def sync(out):
        leaves = jax.tree_util.tree_leaves(out)
        return np.asarray(leaves[-1].ravel()[:8])

    tiny = jax.jit(lambda x: x + 1)
    tiny_in = jax.device_put(np.int32(1))
    int(np.asarray(tiny(tiny_in)))
    t0 = time.perf_counter()
    for _ in range(3):
        int(np.asarray(tiny(tiny_in)))
    rtt = (time.perf_counter() - t0) / 3
    print(f"dispatch+fetch rtt: {rtt*1e3:.1f} ms", file=sys.stderr)

    def timeit(name, fn, *args):
        out = fn(*args)
        sync(out)                      # compile + first run
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            times.append(time.perf_counter() - t0)
        step = max(min(times) - rtt, 1e-7)
        print(f"  {name}: {step*1e3:.3f} ms", file=sys.stderr)
        return step, out

    # ---- inputs on device -------------------------------------------------
    def hash_frames():
        n = B * H * W * 3
        i = jax.lax.iota(jnp.uint32, n)
        x = i * jnp.uint32(2654435761)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(2246822519)
        x = x ^ (x >> 13)
        return (x & jnp.uint32(0xFF)).astype(jnp.uint8).reshape(B, H, W, 3)

    frames = jax.jit(hash_frames)()
    sync(frames)
    qw_dev = jax.device_put(qw)
    intra_dev = jax.device_put(intra_q)

    rows = []

    def add(name, step_s, read_b, write_b, note=""):
        total = read_b + write_b
        floor_ms = total / (HBM_GBS * 1e9) * 1e3
        rows.append({
            "stage": name,
            "ms": round(step_s * 1e3, 3),
            "hbm_read_mb": round(read_b / MB, 1),
            "hbm_write_mb": round(write_b / MB, 1),
            "bw_floor_ms": round(floor_ms, 3),
            "x_over_floor": round(step_s * 1e3 / floor_ms, 1) if floor_ms else None,
            "note": note,
        })

    # full pipeline (authoritative)
    full = _jitted_correct_pipeline(qscale, MSB)
    t_full, _ = timeit("full pipeline", full, frames, intra_dev)

    # color + subsample
    @jax.jit
    def color(rgb):
        pix = pack_rgbx_u32(rgb, jnp)
        y, cb, cr = rgb_to_ycbcr_packed(pix, jnp, "studio")
        return y, subsample_420(cb, jnp), subsample_420(cr, jnp)

    t_color, planes = timeit("color+subsample", color, frames)
    n_px = B * H * W
    add("color+subsample", t_color, n_px * 3, n_px + n_px // 2,
        "read interleaved u8 as packed u32; write y + half-res cb,cr")

    # blockize relayout
    @jax.jit
    def blockize(y, cb, cr):
        bsz = y.shape[0]
        lg = y.reshape(bsz, mbh, 2, 8, mbw, 2, 8)
        luma = lg.transpose(0, 1, 6, 3, 4, 2, 5).reshape(bsz, mbh, 64, mbw, 4)
        cbb = cb.reshape(bsz, mbh, 8, mbw, 8).transpose(0, 1, 4, 2, 3).reshape(
            bsz, mbh, 64, mbw, 1)
        crb = cr.reshape(bsz, mbh, 8, mbw, 8).transpose(0, 1, 4, 2, 3).reshape(
            bsz, mbh, 64, mbw, 1)
        return jnp.concatenate([luma, cbb, crb], axis=-1).reshape(bsz * mbh, 64, nb)

    t_blk, blocks = timeit("blockize (u8 relayout)", blockize, *planes)
    add("blockize", t_blk, n_px * 3 // 2, n_px * 3 // 2, "pure u8 relayout")

    # VLC kernel
    @jax.jit
    def vlc(blocks):
        return vlc_fused_slots_from_blocks_tpu(blocks, qw_dev)

    t_vlc, (vstack, flens) = timeit("vlc kernel (fused)", vlc, blocks)
    vstack_b = r * 64 * nb * 4
    flens_b = r * 16 * nb * 4
    add("vlc kernel", t_vlc, n_px * 3 // 2, vstack_b + flens_b,
        "DCT+quant+zigzag+pred+VLC+4:1 fuse in VMEM")

    # stream transpose
    @jax.jit
    def stream(vstack, flens):
        return fused_stack_to_stream(vstack, flens)

    t_str, streams = timeit("stream transpose", stream, vstack, flens)
    add("stream transpose", t_str, vstack_b + flens_b, vstack_b + flens_b,
        "XLA tiled transpose of fused slots")

    # pack
    @jax.jit
    def pack(v0, v1, v2, v3, fl):
        return pack_words_fused4_core(v0, v1, v2, v3, fl, MSB // 4,
                                      bit_offset=38, emit_be=True)

    t_pack, (words, nbits) = timeit("pack (fused4 emit_be)", pack, *streams)
    words_b = B * mbh * MSB
    add("pack", t_pack, vstack_b + flens_b, words_b,
        "incl. XLA cumsum prep; MXU one-hot scatter in kernel")

    # serialize
    @jax.jit
    def serialize(words):
        return words_be_to_bytes(words)

    t_ser, _ = timeit("serialize (bitcast)", serialize, words)
    add("serialize", t_ser, words_b, words_b, "words->bytes bitcast")

    t_sum = sum(x["ms"] for x in rows) / 1e3
    doc = {
        "config": f"{B}x1080p q={QUALITY} msb={MSB}",
        "device": str(dev),
        "hbm_gbs_assumed": HBM_GBS,
        "full_pipeline_ms": round(t_full * 1e3, 3),
        "fps": round(B / t_full, 1),
        "stage_sum_ms": round(t_sum * 1e3, 3),
        "fusion_gain_ms": round((t_sum - t_full) * 1e3, 3),
        "stages": rows,
    }
    print(json.dumps(doc, indent=1))

    # markdown for ARCHITECTURE.md
    print("\n| stage | ms | HBM r+w MB | BW floor ms | x floor | note |",
          file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for x in rows:
        print(f"| {x['stage']} | {x['ms']} | "
              f"{x['hbm_read_mb'] + x['hbm_write_mb']:.1f} | "
              f"{x['bw_floor_ms']} | {x['x_over_floor']} | {x['note']} |",
              file=sys.stderr)
    print(f"| **full (fused)** | **{doc['full_pipeline_ms']}** | | | | "
          f"sum of stages {doc['stage_sum_ms']} ms |", file=sys.stderr)


if __name__ == "__main__":
    main()
