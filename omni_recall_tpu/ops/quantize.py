"""int8 row quantization with exact error norms (certificate-sound).

The int8 scan path stores per-row symmetric-quantized embeddings plus the
EXACT quantization error norm, so the device upper bound can fold in a
per-row correction that provably covers the dequantization error:

    |q.c - (q8.c8)*s_q*s_c| <= ||q||*ec + eq*||c_hat||
                            <= ec*(1+eq) + eq     (unit-norm rows)

where eq/ec are the stored error norms. Keyword weights are CEIL-quantized
(w8/127 >= w), so the quantized keyword term never undershoots.
"""

from __future__ import annotations

import numpy as np


def quantize_rows_int8(x: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization.

    Returns (q int8[N, d], scale f32[N], err_norm f32[N]) with
    x ~= q * scale[:, None] and err_norm = ||x - q*scale|| exactly (float64).
    Zero rows quantize to zeros with scale 0 and err 0.
    """
    x = np.asarray(x, dtype=np.float32)
    absmax = np.abs(x).max(axis=1) if x.size else np.zeros(x.shape[0], np.float32)
    scale = (absmax / 127.0).astype(np.float32)
    safe = np.where(scale > 0, scale, 1.0).astype(np.float32)
    q = np.clip(np.rint(x / safe[:, None]), -127, 127).astype(np.int8)
    deq = q.astype(np.float64) * scale.astype(np.float64)[:, None]
    err = np.sqrt(np.sum((x.astype(np.float64) - deq) ** 2, axis=1))
    # round the error norm UP to f32 so the stored bound is never optimistic
    err32 = np.nextafter(err.astype(np.float32), np.float32(np.inf)).astype(np.float32)
    err32[err == 0.0] = 0.0
    return q, scale, err32


def quantize_rows_int8_residual(
    x: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Two-plane residual int8 quantization for the device refine stage
    (ops/refine.py): x ~= q1*s1 + q2*s2 with the SECOND-order residual norm

        err2[i] = || x[i] - q1[i]*s1[i] - q2[i]*s2[i] ||   (exact float64,
                  rounded UP to f32 so the stored bound is never optimistic)

    For unit-norm rows at d=768 the first-plane residual is ~8e-3, so err2
    lands around 8e-3/254 ~= 3e-5 — two int8 planes recover the cosine to
    ~f32-level accuracy while keeping the device dot products EXACT integer
    arithmetic (no bf16 rounding to bound).

    Returns (q1 int8[N,d], s1 f32[N], err1 f32[N], q2 int8[N,d], s2 f32[N],
    err2 f32[N]); (q1, s1, err1) are bit-identical to quantize_rows_int8(x)
    so the scan path and the refine path share one first plane.
    """
    x = np.asarray(x, dtype=np.float32)
    q1, s1, err1 = quantize_rows_int8(x)
    # exact f64 residual: int8*f32 products are exactly representable in f64
    resid = x.astype(np.float64) - q1.astype(np.float64) * s1.astype(np.float64)[:, None]
    q2, s2, _ = quantize_rows_int8(resid.astype(np.float32))
    true_resid = resid - q2.astype(np.float64) * s2.astype(np.float64)[:, None]
    err2 = np.sqrt(np.sum(true_resid**2, axis=1))
    err2_32 = np.nextafter(err2.astype(np.float32), np.float32(np.inf)).astype(np.float32)
    err2_32[err2 == 0.0] = 0.0
    return q1, s1, err1, q2, s2, err2_32


def ceil_quantize_weights_int8(w: np.ndarray) -> np.ndarray:
    """Ceil-quantize keyword weights to int8 so w8/127 >= w (sound upper
    bound). Weights are in [0, 1] by construction (ops/hashing.py)."""
    return np.clip(np.ceil(np.asarray(w, dtype=np.float64) * 127.0), 0, 127).astype(np.int8)
