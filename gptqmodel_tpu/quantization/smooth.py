"""Weight smoothing for the RTN failsafe path.

Analog of the reference's 8 SmoothMethods (config.py:882-1046,
fallback_smooth.py ``smooth_block``): modules quantized without calibration
(dead MoE experts, fallback) first get their per-row outliers tamed so the
RTN grid isn't wasted on a single extreme value.

Implemented methods (clip family operates per quantization group):
- ``percentile``: clamp each group row to ±the p-th percentile of |w|
- ``mad``: clamp to median ± k·1.4826·MAD (σ-calibrated, reference
  MAD_TO_STD_SCALE)
- ``rms_row``: divide each out-row by its RMS; the factor folds exactly into
  the quantization scales (returned for the caller to re-apply)
"""

from __future__ import annotations

import numpy as np

MAD_TO_STD_SCALE = 1.4826


def smooth_weight(
    W: np.ndarray,
    method: str,
    group_size: int,
    percentile: float = 99.5,
    mad_k: float = 4.0,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Returns (W_smoothed, row_scale or None).

    ``row_scale`` [out] multiplies the dequantized result back (fold into
    quantization scales); clip methods return None (lossy range tightening).
    """
    W = np.asarray(W, np.float32)
    out_f, in_f = W.shape
    g = in_f if group_size in (-1, None) else group_size

    if method == "rms_row":
        rms = np.sqrt(np.mean(W * W, axis=1, keepdims=True))
        rms = np.maximum(rms, 1e-8)
        return W / rms, rms[:, 0]

    blocks = W.reshape(out_f, in_f // g, g)
    if method == "percentile":
        lim = np.percentile(np.abs(blocks), percentile, axis=-1, keepdims=True)
    elif method == "mad":
        med = np.median(blocks, axis=-1, keepdims=True)
        mad = np.median(np.abs(blocks - med), axis=-1, keepdims=True)
        lim = np.abs(med) + mad_k * MAD_TO_STD_SCALE * np.maximum(mad, 1e-8)
    else:
        raise ValueError(f"unknown smooth method: {method}")
    lim = np.maximum(lim, 1e-8)
    return np.clip(blocks, -lim, lim).reshape(out_f, in_f), None
