"""Sharded encode on the 8-device virtual CPU mesh: bytes must be
identical to the host oracle under every mesh shape."""

import numpy as np
import pytest

import jax

from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
from ec504_imageencoder_tpu.parallel import mesh as mesh_lib
from ec504_imageencoder_tpu.parallel.sharded_encoder import ShardedMPEG1Encoder

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def frames(fixture_frames):
    return np.stack([fixture_frames["0"], fixture_frames["1"]] * 2)[:, :128, :192]


@pytest.fixture(scope="module")
def reference_bytes(frames):
    enc = MPEG1IntraEncoder(quality=45, backend="numpy", max_slice_bytes=8192)
    return enc.encode(frames)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8), (2, 2)])
def test_sharded_matches_oracle(frames, reference_bytes, shape):
    nd, nr = shape
    enc = ShardedMPEG1Encoder(
        quality=45,
        backend="jax",
        max_slice_bytes=8192,
        mesh=mesh_lib.make_mesh(n_data=nd, n_rows=nr),
    )
    assert enc.encode(frames) == reference_bytes


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    seg, bits = out
    assert np.asarray(bits).min() > 0
