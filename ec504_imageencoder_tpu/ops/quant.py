"""Quantization / dequantization of DCT coefficients.

Reference: image_processing.c:349-370 — `(int)(round(dct)/q)` where the
DCT values are integral doubles, so the operation is exactly C truncating
integer division (proof: |r/q| >= 1/255 >> half-ulp of any representable
quotient, so the double division can never round across an integer).
"""

from __future__ import annotations

import numpy as np


def quantize(dct_int, scaled_q, xp=np):
    """Truncating division toward zero: (..., 8, 8) i32 / (8, 8) i32."""
    d = dct_int.astype(xp.int32)
    q = scaled_q.astype(xp.int32)
    return xp.sign(d) * (xp.abs(d) // q)


def dequantize(quantized, q_matrix, xp=np):
    """Reconstruction multiply (image_processing.c:438-446; reference uses the
    *unscaled* base matrix — kept for its latent decode path, while the
    correct decoder passes the scaled matrix)."""
    return quantized.astype(xp.int32) * q_matrix.astype(xp.int32)
