"""Sharded encode step: the correct-mode pipeline jitted over a mesh.

Frames shard over the `data` axis, image rows (=> macroblock rows =>
slices) over the `rows` axis.  No hand-written collectives: slices are
independent bitstream islands, so GSPMD compiles the pipeline into purely
local compute; the segment gather happens when the host reads the output.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ec504_imageencoder_tpu.models.mpeg1 import (
    correct_pipeline,
    correct_pipeline_planes,
)
from ec504_imageencoder_tpu.parallel import mesh as mesh_lib


@functools.lru_cache(maxsize=8)
def _sharded_pipeline(
    mesh: "jax.sharding.Mesh", qscale: int, max_slice_bytes: int,
    dct_impl: str = "aan", color_range: str = "studio",
):
    fs = mesh_lib.frame_sharding(mesh)
    rep = mesh_lib.replicated(mesh)

    def fn(rgb, intra_q):
        return correct_pipeline(
            rgb, intra_q, qscale, max_slice_bytes, xp=jnp,
            dct_impl=dct_impl, color_range=color_range,
        )

    return jax.jit(
        fn,
        in_shardings=(fs, rep),
        out_shardings=(
            mesh_lib.segment_sharding(mesh),
            mesh_lib.bits_sharding(mesh),
        ),
    )


@functools.lru_cache(maxsize=8)
def _sharded_planes_pipeline(
    mesh: "jax.sharding.Mesh", qscale: int, max_slice_bytes: int,
    dct_impl: str = "aan",
):
    """YCbCr 4:2:0 planes intake over the mesh: Y image rows shard over
    `rows` like the RGB intake's H axis; the half-res chroma rows shard
    over the same axis (both are multiples of 8 per MB row, so every
    pipeline stage stays row-local and collective-free)."""
    ps = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(mesh_lib.DATA_AXIS,
                                         mesh_lib.ROWS_AXIS, None)
    )
    rep = mesh_lib.replicated(mesh)

    def fn(y, cb, cr, intra_q):
        return correct_pipeline_planes(
            y, cb, cr, intra_q, qscale, max_slice_bytes, xp=jnp,
            dct_impl=dct_impl,
        )

    return jax.jit(
        fn,
        in_shardings=(ps, ps, ps, rep),
        out_shardings=(
            mesh_lib.segment_sharding(mesh),
            mesh_lib.bits_sharding(mesh),
        ),
    )


from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder


class ShardedMPEG1Encoder(MPEG1IntraEncoder):
    """MPEG1IntraEncoder whose device pipeline runs across a mesh.

    Same host-side API and identical bytes out; the batch axis shards over
    `data` and image rows over `rows`.  Batch size should divide the
    data-axis size for even utilization (GSPMD handles remainders but pads).
    """

    def __init__(self, *args, mesh=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()

    def _check_divisible(self, mbh: int) -> tuple[int, int]:
        n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
        n_rows = self.mesh.shape[mesh_lib.ROWS_AXIS]
        if mbh % n_rows:
            raise ValueError(
                f"padded frame has {mbh} MB rows, not divisible by the "
                f"rows mesh axis ({n_rows}); pick n_rows dividing {mbh}"
            )
        return n_data, n_rows

    def _pipeline_once(self, padded: np.ndarray, msb: int):
        n_data, _ = self._check_divisible(padded.shape[1] // 16)
        batch = padded.shape[0]
        pad_b = -batch % n_data  # replicate-pad batch to fill the data axis
        if pad_b:
            padded = np.concatenate([padded, padded[-1:].repeat(pad_b, 0)])
        fn = _sharded_pipeline(
            self.mesh, self.qscale, msb, self.dct_impl, self.color_range,
        )
        seg_dev, bits_dev = fn(padded, self.intra_q)
        if pad_b:
            seg_dev, bits_dev = seg_dev[:batch], bits_dev[:batch]
        return seg_dev, bits_dev

    def _planes_once(self, planes, msb: int):
        y, cb, cr = planes
        n_data, _ = self._check_divisible(y.shape[1] // 16)
        batch = y.shape[0]
        pad_b = -batch % n_data
        if pad_b:
            y, cb, cr = (
                np.concatenate([p, p[-1:].repeat(pad_b, 0)])
                for p in (y, cb, cr)
            )
        fn = _sharded_planes_pipeline(
            self.mesh, self.qscale, msb, self.dct_impl,
        )
        seg_dev, bits_dev = fn(y, cb, cr, self.intra_q)
        if pad_b:
            seg_dev, bits_dev = seg_dev[:batch], bits_dev[:batch]
        return seg_dev, bits_dev

    def encode_from_coeffs(self, *args, **kwargs):
        raise NotImplementedError(
            "the coefficients intake is single-device (the in-jit IDCT "
            "is not sharded yet); decode to planes and use "
            "encode_from_planes, which shards"
        )
