"""Device mesh + sharding for the encoder.

Parallel axes of this workload (SURVEY.md §2.1):
  * `data`  — frames; every I-frame is independent (the DP analogue).
  * `rows`  — macroblock rows within a frame; each row is one slice, and
    slices are byte-aligned independent bitstream islands, so row sharding
    needs no cross-device communication until the final segment gather
    (the SP analogue).

The encode pipeline is a pure function, so scaling = jit with sharding
annotations and letting GSPMD place everything; the only collective in
the whole program is the implicit all-gather when the host fetches the
per-slice byte segments.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
ROWS_AXIS = "rows"


def make_mesh(n_data: int | None = None, n_rows: int = 1, devices=None) -> Mesh:
    """Build a (data, rows) mesh.  Defaults to all devices on `data`."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_rows
    if n_data * n_rows > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_rows} needs {n_data * n_rows} devices, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[: n_data * n_rows]).reshape(n_data, n_rows)
    return Mesh(grid, (DATA_AXIS, ROWS_AXIS))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, 3) frames: batch over data, image rows over rows.

    Sharding H over `rows` keeps every op in the pipeline local: color
    conversion and 4:2:0 are 2x2-local, blockize/DCT/VLC are 8x8-local,
    DC prediction chains only along macroblock columns (within a row),
    and packing is per-slice (per MB row).
    """
    return NamedSharding(mesh, P(DATA_AXIS, ROWS_AXIS, None, None))


def segment_sharding(mesh: Mesh) -> NamedSharding:
    """(B, mb_h, max_bytes) packed slice segments."""
    return NamedSharding(mesh, P(DATA_AXIS, ROWS_AXIS, None))


def bits_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, ROWS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
