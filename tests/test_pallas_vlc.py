"""Fused Pallas VLC kernel vs the XLA reference path (interpret mode).

The kernel itself is TPU-targeted; `interpret=True` runs its exact
dataflow through the Pallas interpreter on CPU, which validates every
select chain, the in-kernel one-hot lookup, and the fold semantics
against `block_streams_correct64`.
"""

import numpy as np
import pytest

from ec504_imageencoder_tpu.ops.vlc_device import block_streams_correct64


def _random_blocks(rng, r, nb):
    zz = np.zeros((r, nb, 64), np.int32)
    for i in range(r):
        for n in range(nb):
            cnt = rng.integers(0, 40)
            pos = rng.choice(64, size=cnt, replace=False)
            zz[i, n, pos] = rng.integers(-300, 301, size=cnt)
    zz[..., 0] = rng.integers(0, 256, size=(r, nb))
    pred = rng.integers(0, 256, size=(r, nb)).astype(np.int32)
    return zz, pred


def test_vlc_kernel_interpret_matches_reference(rng):
    from ec504_imageencoder_tpu.ops.pallas_vlc import vlc_slots_tpu

    r, mbw = 2, 3
    nb = mbw * 6
    zz, pred = _random_blocks(rng, r, nb)

    comp = np.arange(nb) % 6
    is_luma = np.broadcast_to(comp < 4, (r, nb)).astype(np.int32)
    mb_first = np.broadcast_to(comp == 0, (r, nb)).astype(np.int32)
    ref_c, ref_l = block_streams_correct64(
        zz, pred, is_luma, np, mb_first=mb_first
    )  # (r, nb, 64)

    zzT = np.ascontiguousarray(zz.transpose(0, 2, 1))
    got_c, got_l = vlc_slots_tpu(zzT, pred, interpret=True)
    got_c = np.asarray(got_c).transpose(0, 2, 1)
    got_l = np.asarray(got_l).transpose(0, 2, 1)
    assert np.array_equal(got_l, ref_l)
    assert np.array_equal(got_c & ((1 << np.maximum(got_l, 0)) - 1).astype(np.uint32),
                          ref_c & ((1 << np.maximum(ref_l, 0)) - 1).astype(np.uint32))


def test_fuse_slots_streamwise_preserves_bitstream(rng):
    """Reconstruct the bit stream from the 4:1 fused slots and compare to
    the oracle packing of the raw slot stream."""
    import jax.numpy as jnp

    from ec504_imageencoder_tpu.ops.bitpack import pack_bytes
    from ec504_imageencoder_tpu.ops.pallas_vlc import fuse_slots_streamwise

    r, nb = 2, 12
    lens = rng.integers(0, 25, (r, 64, nb)).astype(np.int32)
    lens[:, ::5] = 0
    codes = (rng.integers(0, 1 << 31, (r, 64, nb)) &
             ((1 << np.maximum(lens, 1)) - 1)).astype(np.uint32)

    v0, v1, v2, v3, flens = [np.asarray(a) for a in fuse_slots_streamwise(
        jnp.asarray(codes), jnp.asarray(lens))]

    # oracle: raw slots in stream order (block-major, slot-minor)
    raw_c = codes.transpose(0, 2, 1).reshape(r, nb * 64)
    raw_l = lens.transpose(0, 2, 1).reshape(r, nb * 64)
    want, want_bits = pack_bytes(raw_c, raw_l, 4096)

    # reconstruct from fused slots with python bigints
    for i in range(r):
        acc, total = 0, 0
        for f in range(flens.shape[1]):
            val = ((int(v0[i, f]) << 96) | (int(v1[i, f]) << 64)
                   | (int(v2[i, f]) << 32) | int(v3[i, f]))
            ln = int(flens[i, f])
            assert val < (1 << max(ln, 1)) or ln == 0
            acc = (acc << ln) | val
            total += ln
        assert total == int(want_bits[i])
        got = acc << (-total % 8)
        got_bytes = got.to_bytes((total + 7) // 8, "big") if total else b""
        assert got_bytes == bytes(want[i, : (total + 7) // 8])


def test_vlc_from_blocks_kernel_matches_reference_chain(rng):
    """Full-block kernel (DCT+quant+zigzag+pred+VLC in one) vs the staged
    reference path, in interpret mode."""
    from ec504_imageencoder_tpu.models.mpeg1 import (
        _dc_predictors,
        quality_to_quant,
    )
    from ec504_imageencoder_tpu.ops.dct import aan_dct_nb
    from ec504_imageencoder_tpu.ops.pallas_vlc import (
        blocks_to_px64,
        vlc_from_blocks_tpu,
    )
    from ec504_imageencoder_tpu.ops.quant import quantize
    from ec504_imageencoder_tpu.ops.vlc_device import block_streams_correct64
    from ec504_imageencoder_tpu.utils.tables import ZIGZAG_GATHER

    r, mbw = 2, 2
    nb = mbw * 6
    blocks = rng.integers(0, 256, (r, 8, 8, nb), dtype=np.uint8)
    intra_q, qscale = quality_to_quant(50)
    qw = (intra_q * qscale).astype(np.int32)

    # reference chain (numpy)
    f = aan_dct_nb(blocks, np)                       # (r, 8, 8, nb)
    dc = np.clip((f[:, 0, 0, :] + 4) >> 3, 0, 255)   # (r, nb)
    num = 16 * np.abs(f) + qw[..., None]
    mag = num // (2 * qw[..., None])
    lvl = np.sign(f) * np.clip(mag, 0, 255)
    zr, zc = ZIGZAG_GATHER // 8, ZIGZAG_GATHER % 8
    zz = np.stack([lvl[:, zr[k], zc[k], :] for k in range(64)], axis=1)
    zz[:, 0, :] = dc                                 # (r, 64, nb)

    pred = _dc_predictors(
        dc.reshape(r, 1, mbw, 6), r, 1, mbw, np
    ).reshape(r, nb)
    comp = np.arange(nb) % 6
    is_luma = np.broadcast_to(comp < 4, (r, nb)).astype(np.int32)
    mb_first = np.broadcast_to(comp == 0, (r, nb)).astype(np.int32)
    ref_c, ref_l = block_streams_correct64(
        zz.transpose(0, 2, 1), pred, is_luma, np, mb_first=mb_first
    )  # (r, nb, 64)

    got_c, got_l = vlc_from_blocks_tpu(blocks_to_px64(blocks), qw,
                                       interpret=True)
    got_c = np.asarray(got_c).transpose(0, 2, 1)
    got_l = np.asarray(got_l).transpose(0, 2, 1)
    assert np.array_equal(got_l, ref_l)
    m_ref = ref_c & ((1 << np.maximum(ref_l, 0)) - 1).astype(np.uint32)
    m_got = got_c & ((1 << np.maximum(got_l, 0)) - 1).astype(np.uint32)
    assert np.array_equal(m_got, m_ref)


def test_fused8_slot_kernel_preserves_bitstream(rng):
    """In-kernel 8:1 slot fusion reconstructs the same bit stream as the
    4:1 staged path (bigint reconstruction, both in interpret mode)."""
    from ec504_imageencoder_tpu.models.mpeg1 import quality_to_quant
    from ec504_imageencoder_tpu.ops.pallas_vlc import (
        blocks_to_px64,
        fuse_slots_streamwise,
        fused8_stack_to_stream,
        vlc_from_blocks_tpu,
        vlc_fused8_slots_from_blocks_tpu,
    )

    r, nb = 2, 18
    blocks = blocks_to_px64(rng.integers(0, 256, (r, 8, 8, nb), dtype=np.uint8))
    intra_q, qscale = quality_to_quant(50)
    qw = (intra_q * qscale).astype(np.int32)

    codes, lens = vlc_from_blocks_tpu(blocks, qw, interpret=True)
    v0, v1, v2, v3, fl4 = [np.asarray(a) for a in
                           fuse_slots_streamwise(codes, lens)]
    vstack, flens = vlc_fused8_slots_from_blocks_tpu(blocks, qw, interpret=True)
    vs, fl8 = fused8_stack_to_stream(vstack, flens)
    vs = [np.asarray(a) for a in vs]
    fl8 = np.asarray(fl8)

    for i in range(r):
        acc4, t4 = 0, 0
        for f in range(fl4.shape[1]):
            val = ((int(v0[i, f]) << 96) | (int(v1[i, f]) << 64)
                   | (int(v2[i, f]) << 32) | int(v3[i, f]))
            ln = int(fl4[i, f])
            acc4 = (acc4 << ln) | val
            t4 += ln
        acc8, t8 = 0, 0
        for f in range(fl8.shape[1]):
            val = 0
            for k in range(8):
                val = (val << 32) | int(vs[k][i, f])
            ln = int(fl8[i, f])
            assert ln == 0 or val < (1 << ln)
            acc8 = (acc8 << ln) | val
            t8 += ln
        assert (t4, acc4) == (t8, acc8)


def test_fused_slot_kernel_matches_staged(rng):
    """In-kernel 4:1 slot fusion == staged fuse_slots_streamwise."""
    from ec504_imageencoder_tpu.models.mpeg1 import quality_to_quant
    from ec504_imageencoder_tpu.ops.pallas_vlc import (
        blocks_to_px64,
        fuse_slots_streamwise,
        fused_stack_to_stream,
        vlc_from_blocks_tpu,
        vlc_fused_slots_from_blocks_tpu,
    )

    r, nb = 2, 12
    blocks = blocks_to_px64(rng.integers(0, 256, (r, 8, 8, nb), dtype=np.uint8))
    intra_q, qscale = quality_to_quant(50)
    qw = (intra_q * qscale).astype(np.int32)

    codes, lens = vlc_from_blocks_tpu(blocks, qw, interpret=True)
    want = [np.asarray(a) for a in fuse_slots_streamwise(codes, lens)]
    vstack, flens = vlc_fused_slots_from_blocks_tpu(blocks, qw, interpret=True)
    got = [np.asarray(a) for a in fused_stack_to_stream(vstack, flens)]
    for w, g in zip(want, got):
        assert np.array_equal(w, g)


def test_compat_kernel_matches_block_streams_compat(rng):
    """Compat full-block kernel (AAN + truncating quant + zigzag + bug-
    compatible emission) vs the oracle-locked block_streams_compat chain,
    with the EOB and MB-header folds applied to the 65-slot oracle."""
    from ec504_imageencoder_tpu.ops.dct import aan_dct_nb
    from ec504_imageencoder_tpu.ops.pallas_vlc import (
        blocks_to_px64,
        vlc_compat_slots_from_blocks_tpu,
    )
    from ec504_imageencoder_tpu.ops.vlc_device import block_streams_compat
    from ec504_imageencoder_tpu.utils.tables import (
        ZIGZAG_GATHER,
        scale_quantization_matrix,
    )

    r, nmbs = 2, 3
    nb = nmbs * 6
    blocks = rng.integers(0, 256, (r, 8, 8, nb), dtype=np.uint8)
    scaled_q = scale_quantization_matrix(12).astype(np.int32)

    # oracle chain (numpy)
    f = aan_dct_nb(blocks, np)                       # (r, 8, 8, nb)
    mag = np.abs(f) // scaled_q[..., None]
    lvl = np.sign(f) * mag
    zr, zc = ZIGZAG_GATHER // 8, ZIGZAG_GATHER % 8
    zz = np.stack([lvl[:, zr[k], zc[k], :] for k in range(64)], axis=1)
    comp = np.arange(nb) % 6
    is_luma = np.broadcast_to(comp < 4, (r, nb)).astype(np.int32)
    c65, l65 = block_streams_compat(zz.transpose(0, 2, 1), is_luma, np)

    # fold EOB (slot 64 -> slot 63) and the 2-bit MB header (comp==0 DC)
    ref_c = c65[..., :64].astype(np.uint32).copy()
    ref_l = l65[..., :64].copy()
    ref_c[..., 63] = (ref_c[..., 63] << 2) | 0b10
    ref_l[..., 63] += 2
    first = comp == 0
    ref_c[:, first, 0] = (np.uint32(0b11) << ref_l[:, first, 0]) | ref_c[:, first, 0]
    ref_l[:, first, 0] += 2

    got_c, got_l = vlc_compat_slots_from_blocks_tpu(
        blocks_to_px64(blocks), scaled_q, interpret=True
    )
    got_c = np.asarray(got_c).transpose(0, 2, 1)
    got_l = np.asarray(got_l).transpose(0, 2, 1)
    assert np.array_equal(got_l, ref_l)
    m_ref = ref_c & ((1 << np.maximum(ref_l, 0)) - 1).astype(np.uint32)
    m_got = got_c & ((1 << np.maximum(got_l, 0)) - 1).astype(np.uint32)
    assert np.array_equal(m_got, m_ref)


def test_compat_blockize_matches_block_extraction(rng):
    """compat_blockize_px64's reshape/transposes produce exactly the
    blocks the generic compat pipeline extracts (incl. the Q3 chroma
    half-stride view)."""
    from ec504_imageencoder_tpu.models.encoder import (
        CROP_H,
        CROP_W,
        N_MBS,
        N_SLICES,
        compat_blockize_px64,
    )

    bsz, h, w = 2, 600, 400
    y = rng.integers(0, 256, (bsz, h, w), dtype=np.uint8)
    cb = rng.integers(0, 256, (bsz, h, w), dtype=np.uint8)
    cr = rng.integers(0, 256, (bsz, h, w), dtype=np.uint8)

    got = compat_blockize_px64(y, cb, cr, np)        # (B*6, 64, 54)

    cb_flat = cb.reshape(bsz, -1)
    cr_flat = cr.reshape(bsz, -1)
    half = w // 2
    for b in range(bsz):
        for s in range(N_SLICES):
            for m in range(N_MBS):
                x0, y0 = s * 16, m * 16
                for blk in range(4):
                    xs, ys = x0 + (blk % 2) * 8, y0 + (blk // 2) * 8
                    want = y[b, ys : ys + 8, xs : xs + 8]
                    lane = m * 6 + blk
                    gotb = got[b * N_SLICES + s, :, lane].reshape(8, 8).T
                    assert np.array_equal(gotb, want), (b, s, m, blk)
                # chroma: full-res plane, half-width stride (Q3)
                rows = (y0 // 2 + np.arange(8))[:, None] * half
                cols = x0 // 2 + np.arange(8)[None, :]
                idx = rows + cols
                for ci, flat in ((4, cb_flat), (5, cr_flat)):
                    want = flat[b][idx]
                    gotb = got[b * N_SLICES + s, :, m * 6 + ci].reshape(8, 8).T
                    assert np.array_equal(gotb, want), (b, s, m, ci)


def test_packed_u32_layout_matches_u8(rng):
    """The width-packed (R, 16, NB) u32 block layout (r5: halves the
    host-side blockize relayout cost) must be kernel-equivalent to the
    u8 px-major layout in all three entries."""
    import jax.numpy as jnp

    from ec504_imageencoder_tpu.ops.pallas_vlc import (
        px64_to_packed16,
        vlc_from_blocks_tpu,
        vlc_fused8_slots_from_blocks_tpu,
        vlc_fused_slots_from_blocks_tpu,
    )
    from ec504_imageencoder_tpu.utils.tables import INTRA_Q_MATRIX

    blocks = rng.integers(0, 256, (3, 64, 12), dtype=np.uint8)
    packed = px64_to_packed16(blocks)
    assert packed.shape == (3, 16, 12) and packed.dtype == np.uint32
    qw = jnp.asarray(INTRA_Q_MATRIX.astype(np.int32) * 8)
    for fn in (vlc_fused_slots_from_blocks_tpu,
               vlc_fused8_slots_from_blocks_tpu, vlc_from_blocks_tpu):
        a = fn(jnp.asarray(blocks), qw, interpret=True)
        b = fn(jnp.asarray(packed), qw, interpret=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
