"""Gather-free table lookups for the VLC stage.

Measured on TPU v5e: XLA `table[idx]` gathers serialize (~9 ns/element —
230 ms for the two 12.8M-element AC lookups of a 4x1080p batch).  This
module replaces them with the canonical TPU trick: a one-hot comparison
contracted on the MXU.  Exactness: each one-hot row selects exactly one
entry, and table values travel as byte planes (<= 255, exact in bf16), so
the bf16 matmul is bit-exact.

The ISO AC table (run, |level|) additionally rank-compresses to 111 rows
with a *closed-form* base/count (the same layout as the reference's
two-level blk_rle_lookup index, vlc.c:172-174), keeping the one-hot only
128 wide.
"""

from __future__ import annotations

import functools

import numpy as np

from ec504_imageencoder_tpu.utils import tables

# ---------------------------------------------------------------------------
# rank layout of the AC run/level table — the same two-level scheme as the
# reference's blk_rle_lookup (vlc.c:172-174), but with the base offsets
# recovered by closed form instead of a (gather-hostile) index table.


def _build_rank_tables():
    """rank -> (code, len) arrays for the correct + compat AC tables, plus
    verified base/count vectors derived from the LUTs themselves."""
    base = np.zeros(33, np.int32)
    counts = np.zeros(32, np.int32)
    rank_code = np.zeros(128, np.uint32)
    rank_len = np.zeros(128, np.int32)
    r = 0
    for run in range(32):
        first = 2 if run == 0 else 1
        base[run] = r
        n = 0
        for level in range(first, 41):
            if tables.AC_LEN_CORRECT[run, level]:
                rank_code[r] = tables.AC_CODE_CORRECT[run, level]
                rank_len[r] = tables.AC_LEN_CORRECT[run, level]
                r += 1
                n += 1
        counts[run] = n
    base[32] = r
    return base[:32], counts, rank_code, rank_len


AC_RANK_BASE, AC_RANK_COUNT, AC_RANK_CODE, AC_RANK_LEN = _build_rank_tables()


def rank_base(ri, xp):
    """Closed-form AC_RANK_BASE[ri] (asserted against the table below)."""
    b = xp.where(ri <= 16, 2 * ri + 61, ri + 78)  # runs 7..16 / 17..31
    for v, val in [(6, 72), (5, 69), (4, 66), (3, 62), (2, 57), (1, 39), (0, 0)]:
        b = xp.where(ri == v, val, b)
    return b


def rank_count(ri, xp):
    c = xp.where(ri <= 16, 2, 1)
    for v, val in [(6, 3), (5, 3), (4, 3), (3, 4), (2, 5), (1, 18), (0, 39)]:
        c = xp.where(ri == v, val, c)
    return c


# sanity: closed forms must match the generated layout
assert np.array_equal(rank_base(np.arange(32), np), AC_RANK_BASE), AC_RANK_BASE
assert np.array_equal(rank_count(np.arange(32), np), AC_RANK_COUNT)


def _byte_planes(values_u32: np.ndarray, nbytes: int) -> np.ndarray:
    """(M,) uint32 -> (M, nbytes) f32-able byte planes."""
    planes = [(values_u32 >> (8 * i)) & 0xFF for i in range(nbytes)]
    return np.stack(planes, axis=1).astype(np.float32)


def onehot_lookup_u32(idx, planes, xp, chunk: int = 65536):
    """table[idx] for a small table via chunked one-hot MXU matmuls.

    idx: (...,) int32 in [0, M); planes: (M, P) f32 byte planes (numpy).
    Returns (..., P) f32 plane values (caller recombines).  Under numpy
    falls back to a plain gather.

    Orientation matters: MXU cost is ~M_rows cycles per (M,K)@(K,N) tile
    pass, so the elements must ride the N dimension, not M.  out.T (P, n)
    = planes.T (P, M) @ onehot.T (M, n) costs P*ceil(n/128) cycles instead
    of n — a ~40x reduction measured at the 12.8M-element AC lookup.
    """
    if xp is np:
        return planes[idx]
    import jax
    import jax.numpy as jnp

    m, p = planes.shape
    t = jnp.asarray(planes.T.astype(np.float32)).astype(jnp.bfloat16)  # (P, M)
    shape = idx.shape
    flat = idx.reshape(-1)
    n = flat.shape[0]
    padded = n + (-n) % chunk
    flat = jnp.concatenate([flat, jnp.zeros((padded - n,), flat.dtype)])
    ent = jnp.arange(m, dtype=jnp.int32)

    def body(_, ic):
        oh_t = (ent[:, None] == ic[None, :]).astype(jnp.bfloat16)  # (M, chunk)
        return _, jax.lax.dot_general(
            t, oh_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (P, chunk)

    _, out = jax.lax.scan(body, 0, flat.reshape(-1, chunk))
    # out: (nchunks, P, chunk) -> (padded, P)
    out = out.transpose(0, 2, 1).reshape(padded, p)
    return out[:n].reshape(*shape, p)


def _combine_bytes(plane_vals, nbytes, xp):
    acc = plane_vals[..., 0].astype(xp.uint32)
    for i in range(1, nbytes):
        acc = acc | (plane_vals[..., i].astype(xp.uint32) << (8 * i))
    return acc


def packed_lookup_matrix(values_u32: np.ndarray, value_bits: int,
                         sub_bits: int = 4, epc: int = 6) -> np.ndarray:
    """The (epc*n_h*nv, epc*2**sub_bits) f32 byte-plane matrix used by
    `onehot_lookup_packed` (layout documented there).  Shared with the
    in-kernel lookup in ops/pallas_vlc.py so the two can't diverge:
    T[(t*n_h + h)*nv + b, t*sub + l] = byte b of table[h*sub + l]."""
    m = values_u32.shape[0]
    sub = 1 << sub_bits
    n_h = -(-m // sub)
    nv = (value_bits + 7) // 8
    assert epc * sub <= 128 and epc * n_h * nv <= 128
    padded_tbl = np.zeros(n_h * sub, np.uint32)
    padded_tbl[:m] = values_u32
    tbl = np.zeros((epc * n_h * nv, epc * sub), np.float32)
    for t in range(epc):
        for h in range(n_h):
            for b in range(nv):
                tbl[(t * n_h + h) * nv + b, t * sub : (t + 1) * sub] = (
                    (padded_tbl[h * sub : (h + 1) * sub] >> (8 * b)) & 0xFF
                )
    return tbl


def ac_packed_table() -> np.ndarray:
    """(112,) u32 `code | len<<16` rank-compressed AC table (the kernel-
    side lookup operand; 111 real rows + 1 pad keeps n_h*sub == 112)."""
    return (AC_RANK_CODE | (AC_RANK_LEN.astype(np.uint32) << 16))[:112]


def onehot_lookup_packed(idx, values_u32: np.ndarray, value_bits: int, xp,
                         cols: int = 4096, sub_bits: int = 4, epc: int = 6):
    """Sliced-table one-hot lookup: several elements per MXU column, exact.

    The plain one-hot matmul costs ~1 MXU cycle per element: N columns
    stream one per cycle and only a handful of the 128 output rows (M) do
    useful work.  This version fills both idle dimensions at once:

      * the table is split into n_h sub-tables of 2**sub_bits entries
        (idx = 16*h + l for the default);
      * each column carries `epc` elements, element t occupying the
        disjoint K-range [t*sub, (t+1)*sub) at position l_t — one-hots
        stay 0/1 (no scale mixing, bf16-exact even when indices collide);
      * the M axis carries every (element, h, byte-plane) candidate:
        row (t, h, b) holds byte b of sub-table h over element t's
        K-range.  Each output element is a single 1*byte product — exact.

    Post-matmul, XLA selects the right h-candidate per element (h is
    known from idx).  MXU cost drops to 1/epc cycles per element.

    Requires epc * 2**sub_bits <= 128 (K) and epc * n_h * nbytes <= 128
    (M).  For the 128-entry AC table: sub=16, n_h=7 (indices clipped to
    [0, 112)), epc=6, 3 byte planes -> K=96, M=126.

    idx: (...,) int32 in [0, n_h * 2**sub_bits); returns (...,) uint32.
    """
    if xp is np:
        return values_u32[idx]
    import jax
    import jax.numpy as jnp

    def dense_gather(idx):
        # Non-TPU lowerings (CPU device meshes): a plain gather over the
        # replicated table partitions trivially under GSPMD.  The MXU
        # path's flatten/pad below merges the leading axes, which under
        # pjit interleaves (data, rows)-sharded dims and forces
        # all-gathers (tests/test_sharding.py asserts the compiled
        # sharded step is collective-free).
        table = jnp.asarray(values_u32)
        return table[jnp.clip(idx, 0, values_u32.shape[0] - 1)]

    def mxu_lookup(idx):
        return _onehot_lookup_packed_mxu(
            idx, values_u32, value_bits, cols, sub_bits, epc
        )

    return jax.lax.platform_dependent(
        idx, tpu=mxu_lookup, default=dense_gather
    )


def _onehot_lookup_packed_mxu(idx, values_u32: np.ndarray, value_bits: int,
                              cols: int, sub_bits: int, epc: int):
    import jax
    import jax.numpy as jnp

    m = values_u32.shape[0]
    sub = 1 << sub_bits
    n_h = -(-m // sub)
    nv = (value_bits + 7) // 8
    tmat = jnp.asarray(
        packed_lookup_matrix(values_u32, value_bits, sub_bits, epc)
    ).astype(jnp.bfloat16)

    shape = idx.shape
    flat = idx.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    group = epc * cols
    padded = n + (-n) % group
    flat = jnp.concatenate([flat, jnp.zeros((padded - n,), flat.dtype)])
    blocks = flat.reshape(-1, epc, cols)

    def decode(ic, out, cols_n):
        """Select each element's h-candidate rows and recombine bytes."""
        per_t = []
        for t in range(epc):
            ht = ic[t, :] >> sub_bits
            acc = jnp.zeros((cols_n,), jnp.uint32)
            for b in range(nv):
                byte = jnp.zeros((cols_n,), jnp.uint32)
                for h in range(n_h):
                    # route f32 -> i32 -> u32 (direct f32->u32 unsupported
                    # in Mosaic); values are small nonneg ints, exact
                    cand = out[(t * n_h + h) * nv + b, :].astype(jnp.int32).astype(jnp.uint32)
                    byte = jnp.where(ht == h, cand, byte)
                acc = acc | (byte << (8 * b))
            per_t.append(acc)
        return jnp.stack(per_t, axis=0)                    # (epc, cols)

    def tpu_lookup(blocks):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(ic_ref, t_ref, out_ref):
            ic = ic_ref[0]                                 # (epc, cols) i32
            ent = jax.lax.broadcasted_iota(jnp.int32, (sub, cols), 0)
            oh = jnp.concatenate(
                [
                    (ent == (ic[t, :] & (sub - 1))[None, :]).astype(jnp.bfloat16)
                    for t in range(epc)
                ],
                axis=0,
            )                                              # (epc*sub, cols)
            out = jax.lax.dot_general(
                t_ref[...], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (M, cols)
            out_ref[0] = decode(ic, out, cols)

        nblk = blocks.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((1, epc, cols), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tmat.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, epc, cols), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblk, epc, cols), jnp.uint32),
        )(blocks, tmat)

    def xla_lookup(blocks):
        ent = jnp.arange(sub, dtype=jnp.int32)

        def body(_, ic):                                   # ic: (epc, cols)
            oh = jnp.concatenate(
                [
                    (ent[:, None] == (ic[t, :] & (sub - 1))[None, :]).astype(jnp.bfloat16)
                    for t in range(epc)
                ],
                axis=0,
            )
            out = jax.lax.dot_general(
                tmat, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return _, decode(ic, out, cols)

        _, val = jax.lax.scan(body, 0, blocks)
        return val

    val = jax.lax.platform_dependent(blocks, tpu=tpu_lookup, default=xla_lookup)
    return val.reshape(-1)[:n].reshape(shape)


@functools.lru_cache(maxsize=None)
def _ac_planes():
    # code needs 2 bytes (max 16-bit codes), len 1 byte -> 3 planes
    code_planes = _byte_planes(AC_RANK_CODE, 2)
    len_plane = AC_RANK_LEN.astype(np.float32)[:, None]
    return np.concatenate([code_planes, len_plane], axis=1)  # (128, 3) padded


def ac_table_lookup(ri, al, xp, compat: bool = False):
    """(code, len) from table B.5c/d without sign bit; len 0 = no row.

    ri: run index >= 0; al: |level|.  `compat` reproduces the reference's
    run-0 off-by-one (vlc.c:329-338): the row offset is always al-1, so
    for run 0 level L the level-(L+1) code is returned and L=40 escapes.
    """
    ric = xp.clip(ri, 0, 31)
    base = rank_base(ric, xp)
    count = rank_count(ric, xp)
    if compat:
        k = al - 1
    else:
        k = al - xp.where(ri == 0, 2, 1)
    valid = (ri <= 31) & (k >= 0) & (k < count)
    rank = xp.clip(base + k, 0, 111)  # 111 real rows; keeps n_h*sub == 112
    vals = onehot_lookup_packed(rank, ac_packed_table(), 21, xp)
    code = vals & xp.uint32(0xFFFF)
    length = (vals >> 16).astype(xp.int32)
    code = xp.where(valid, code, xp.uint32(0))
    length = xp.where(valid, length, 0)
    return code, length


@functools.lru_cache(maxsize=None)
def _dc_packed():
    # combined index: is_luma * 16 + size (sizes 0..8) -> 32 entries padded;
    # value = code | len << 8 (codes <= 7 bits, lens <= 7)
    code = np.zeros(32, np.uint32)
    length = np.zeros(32, np.uint32)
    code[0:9] = tables.DC_SIZE_CHROMA_CODE
    length[0:9] = tables.DC_SIZE_CHROMA_LEN
    code[16:25] = tables.DC_SIZE_LUMA_CODE
    length[16:25] = tables.DC_SIZE_LUMA_LEN
    return code | (length << 8)


def dc_size_lookup(is_luma_i, size, xp):
    """(code, len) of the dct_dc_size VLC, both components."""
    idx = is_luma_i * 16 + size
    vals = onehot_lookup_packed(idx, _dc_packed(), 12, xp)
    return vals & xp.uint32(0xFF), (vals >> 8).astype(xp.int32)
