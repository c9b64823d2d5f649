#!/usr/bin/env python3
"""Per-stage roofline accounting for the production-point pipeline.

r5: every stage is timed with the IN-SCAN method (the op repeated G
times inside one jitted lax.scan with a data dependency between steps),
at the production operating point B=16, 4:1 slot fusion (the honest r5 default) — the r4 table
used single-dispatch minus-RTT at B=4/4:1, which the relay tunnel's
±2-4 ms dispatch jitter polluted (r4 VERDICT item 4).  Stage boundaries
match models/mpeg1.py _tpu_pipeline_from_planes (fused4 default):

  color      packed-u32 colorspace + 4:2:0 reduce_window subsample
  blockize   width-packed u32 relayout into the kernels' (R, 16, NB) layout
  vlc        fused4 Pallas kernel (DCT+quant+zigzag+pred+VLC+4:1 fuse)
  stream     fused slot-stack -> stream transposition (XLA relayout)
  pack       fused4 pack kernel (in-kernel byte combine, emit_be)
  serialize  byte-swapped words -> bytes bitcast

Also measured: the full RGB pipeline, and the full YCbCr-planes
pipeline (the JPEG-source intake, which has no color/subsample stage at
all).  Per-stage perturbation: the scan carry is the stage input plus a
{0,1} bump derived from the previous output, which forces sequential
execution without changing content statistics.

Output: JSON (commit as ROOFLINE_r{N}.json) + markdown table on stderr.
Run on the chip: python benchmarks/roofline.py
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

B, H, W = int(os.environ.get("EC504_BENCH_BATCH", "16")), 1088, 1920
QUALITY = 50
G = int(os.environ.get("EC504_ROOFLINE_SCAN", "20"))
HBM_GBS = float(os.environ.get("EC504_HBM_GBS", "819"))  # v5e ~819 GB/s

MB = 1024 * 1024


def main():
    import jax
    import jax.numpy as jnp

    from ec504_imageencoder_tpu.models.mpeg1 import (
        _jitted_correct_pipeline,
        _jitted_planes_pipeline,
        initial_slice_bytes,
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
    msb = initial_slice_bytes(QUALITY, mbw)
    intra_q, qscale = quality_to_quant(QUALITY)
    qw = (intra_q.astype(np.int32) * qscale)

    dev = jax.devices()[0]
    print(f"device: {dev}  B={B} msb={msb} scan={G}", file=sys.stderr)
    float(np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0))))

    tiny = jax.jit(lambda x: x + 1)
    tiny_in = jax.device_put(np.int32(1))
    int(np.asarray(tiny(tiny_in)))
    t0 = time.perf_counter()
    for _ in range(3):
        int(np.asarray(tiny(tiny_in)))
    rtt = (time.perf_counter() - t0) / 3
    print(f"dispatch+fetch rtt: {rtt*1e3:.1f} ms", file=sys.stderr)

    def sync(out):
        leaves = jax.tree_util.tree_leaves(out)
        return np.asarray(leaves[-1].ravel()[:8])

    def in_scan(name, f, args, bumpable=0):
        """Time f(*args) repeated G times in one scan; returns s/step.

        args[bumpable] is perturbed by a {0,1} bump computed from the
        previous output (data dependency without content drift)."""

        def body(c, _):
            out = f(*c)
            leaves = jax.tree_util.tree_leaves(out)
            # consume EVERY output leaf IN FULL: a bump from one leaf —
            # or from a slice — lets XLA dead-code-eliminate or
            # slice-propagate through pure-XLA stages (reshapes,
            # transposes, elementwise) and compute only the sliced
            # elements; the full reduction adds ~one HBM read pass of
            # the outputs to each stage (bounded by its bw floor), which
            # the x_over_floor column absorbs.  Pallas stages are opaque
            # and unaffected.  (r4's bits-only bump was the extreme
            # case: it hid the whole pack kernel.)
            bump = (sum(l.astype(jnp.int32).sum() for l in leaves)
                    & 1).astype(c[bumpable].dtype)
            c2 = list(c)
            c2[bumpable] = c[bumpable] + bump
            return tuple(c2), leaves[0].ravel()[0]

        fn = jax.jit(lambda *a: jax.lax.scan(body, a, None, length=G))
        out = fn(*args)
        sync(out[1])  # compile + first run
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out[1])
            times.append(time.perf_counter() - t0)
        step = max((min(times) - rtt) / G, 1e-7)
        print(f"  {name}: {step*1e3:.3f} ms/step (in-scan)", file=sys.stderr)
        return step

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

    # full pipelines (authoritative)
    full = _jitted_correct_pipeline(qscale, msb)
    t_full = in_scan("full RGB pipeline", lambda f: full(f, intra_dev),
                     (frames,))

    def color_fn(rgb):
        pix = pack_rgbx_u32(rgb, jnp)
        y, cb, cr = rgb_to_ycbcr_packed(pix, jnp, "studio")
        return y, subsample_420(cb, jnp), subsample_420(cr, jnp)

    planes = jax.jit(color_fn)(frames)
    sync(planes)

    planes_fn = _jitted_planes_pipeline(qscale, msb)
    t_planes_full = in_scan(
        "full planes pipeline (JPEG intake)",
        lambda y, cb, cr: planes_fn(y, cb, cr, intra_dev), tuple(planes))

    n_px = B * H * W
    t_color = in_scan("color+subsample", color_fn, (frames,))
    add("color+subsample", t_color, n_px * 3, n_px * 3 // 2,
        "read interleaved u8 as packed u32; write y + half-res cb,cr; "
        "absent from the planes intake")

    def blockize(y, cb, cr):
        # width-packed u32 relayout (production default since r5)
        bsz = y.shape[0]
        yq = jax.lax.bitcast_convert_type(
            y.reshape(bsz, H, W // 4, 4), jnp.uint32)
        lg = yq.reshape(bsz, mbh, 2, 8, mbw, 2, 2)
        luma = lg.transpose(0, 1, 6, 3, 4, 2, 5).reshape(
            bsz, mbh, 16, mbw, 4)

        def chroma_q(p):
            pq = jax.lax.bitcast_convert_type(
                p.reshape(bsz, H // 2, W // 8, 4), jnp.uint32)
            g = pq.reshape(bsz, mbh, 8, mbw, 2)
            return g.transpose(0, 1, 4, 2, 3).reshape(bsz, mbh, 16, mbw, 1)

        return jnp.concatenate(
            [luma, chroma_q(cb), chroma_q(cr)], axis=-1).reshape(
            bsz * mbh, 16, nb)

    blocks = jax.jit(blockize)(*planes)
    sync(blocks)
    t_blk = in_scan("blockize", blockize, tuple(planes))
    add("blockize", t_blk, n_px * 3 // 2, n_px * 3 // 2,
        "width-packed u32 relayout (r5; u8 variant was ~2x)")

    def vlc(blocks):
        return vlc_fused_slots_from_blocks_tpu(blocks, qw_dev)

    vstack, flens = jax.jit(vlc)(blocks)
    sync(flens)
    t_vlc = in_scan("vlc kernel (fused4)", vlc, (blocks,))
    vstack_b = r * 64 * nb * 4
    flens_b = r * 16 * nb * 4
    add("vlc kernel", t_vlc, n_px * 3 // 2, vstack_b + flens_b,
        "DCT+quant+zigzag+pred+VLC+4:1 fuse in VMEM")

    streams = jax.jit(fused_stack_to_stream)(vstack, flens)
    sync(streams[-1])
    t_str = in_scan("stream transpose", fused_stack_to_stream,
                    (vstack, flens))
    add("stream transpose", t_str, vstack_b + flens_b, vstack_b + flens_b,
        "XLA tiled transpose of fused slots")

    def pack(v0, v1, v2, v3, fl):
        return pack_words_fused4_core(v0, v1, v2, v3, fl, msb // 4,
                                      bit_offset=38, emit_be=True)

    words, nbits = jax.jit(pack)(*streams)
    sync(nbits)
    t_pack = in_scan("pack (fused4 emit_be)", pack, tuple(streams),
                     bumpable=4)
    words_b = B * mbh * msb
    add("pack", t_pack, vstack_b + flens_b, words_b,
        "incl. XLA cumsum prep; in-kernel byte combine (emit_be)")

    t_ser = in_scan("serialize", lambda w: words_be_to_bytes(w), (words,))
    add("serialize", t_ser, words_b, words_b, "pure bitcast")

    # compute-floor model for the pack stage: the one-hot MXU placement
    # streams one column per fused slot; columns/s bounds the stage.
    kf = r * (64 * nb // 4)  # fused4 slots
    doc = {
        "config": f"{B}x1080p q={QUALITY} msb={msb} fuse=4 blockize=packed-u32",
        "method": "in_scan",
        "scan_len": G,
        "device": str(dev),
        "hbm_gbs_assumed": HBM_GBS,
        "full_pipeline_ms": round(t_full * 1e3, 3),
        "fps": round(B / t_full, 1),
        "full_planes_pipeline_ms": round(t_planes_full * 1e3, 3),
        "fps_planes_intake": round(B / t_planes_full, 1),
        "stage_sum_ms": round(sum(x["ms"] for x in rows), 3),
        "pack_floor": {
            "fused_slots": kf,
            "model": "one MXU column-cycle per fused slot",
            "measured_ns_per_slot": round(t_pack / kf * 1e9, 3),
        },
        "stages": rows,
    }
    print(json.dumps(doc, indent=1))

    print("\n| stage | in-scan ms | HBM r+w MB | BW floor ms | x floor |",
          file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for x in rows:
        print(f"| {x['stage']} | {x['ms']} | "
              f"{x['hbm_read_mb'] + x['hbm_write_mb']:.1f} | "
              f"{x['bw_floor_ms']} | {x['x_over_floor']} |", file=sys.stderr)
    print(f"| full RGB | {doc['full_pipeline_ms']} | | | |", file=sys.stderr)
    print(f"| full planes | {doc['full_planes_pipeline_ms']} | | | |",
          file=sys.stderr)


if __name__ == "__main__":
    main()
