"""Zigzag scan / inverse scan as constant-index gathers.

Reference: image_processing.c:28-37, 373-381 (scatter formulation); here
expressed as a gather with the inverse permutation so it vectorizes.
"""

from __future__ import annotations

import numpy as np

from ec504_imageencoder_tpu.utils.tables import ZIGZAG_GATHER, ZIGZAG_INDEX


def zigzag_scan(blocks, xp=np):
    """(..., 8, 8) -> (..., 64) in zigzag order."""
    flat = blocks.reshape(*blocks.shape[:-2], 64)
    return flat[..., xp.asarray(ZIGZAG_GATHER)]


def zigzag_descan(scanned, xp=np):
    """(..., 64) zigzag order -> (..., 8, 8)."""
    flat = scanned[..., xp.asarray(ZIGZAG_INDEX.reshape(-1))]
    return flat.reshape(*scanned.shape[:-1], 8, 8)
