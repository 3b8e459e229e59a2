"""Weight smoothing: all 8 reference SmoothMethods.

Analog of the reference's SmoothMethod family (config.py:882-1046) executed
by ``fallback_smooth.py::smooth_block`` / ``mse_optimal_quant``: before a
module is quantized without usable calibration (dead MoE experts, fallback)
— or model-wide via the Smoother preprocessor (looper/module_preprocessor.py,
config.py:1127 SmootherConfig) — each group-size column chunk has its
per-row outliers tamed so the quant grid isn't wasted on a single extreme
value.

The reference iterates column chunks ``W[:, start:end]`` of
``effective_group_size`` and smooths per-row within the chunk
(quantization/gptq.py:705-723); here the same geometry is one vectorized
reshape to ``[out, in//g, g]``.

Methods (names match reference ``SmoothMethod.name``):
- ``percentile``: clamp to ±p-th percentile of |w|
- ``percentile_asym``: clamp to [p_low, p_high] percentiles of w
- ``mad``: clamp to median ± k·1.4826·MAD (σ-calibrated MAD_TO_STD_SCALE)
- ``outlier``: clamp to the kth-smallest |w| keeping (100−pct)% mass
- ``softnorm``: z=(w−mean)/rms, clip z to ±k, map back
- ``log``: percentile in log1p(mu·|w|) space, inverted to a linear clamp
- ``rowcol``: divide by per-row RMS (axis=row; factor returned for exact
  re-fold into quantization scales) or by the scalar mean column RMS
  (axis=col — the reference's quirky scalar, matched)
- ``mse``: ternary-search shrink of the quant range per row-chunk, returns
  the fake-quantized block (reference ``mse_optimal_quant``)
"""

from __future__ import annotations

import math

import numpy as np

MAD_TO_STD_SCALE = 1.4826

#: reference defaults per method (config.py:882-1046)
SMOOTH_DEFAULTS = {
    "percentile": {"percentile": 99.0},
    "percentile_asym": {"low": 0.5, "high": 99.5},
    "mad": {"k": 2.75},
    "outlier": {"pct": 1.0},
    "softnorm": {"k": 3.0},
    "log": {"percentile": 99.0, "mu": 8.0},
    "rowcol": {"axis": "row"},
    "mse": {"steps": 32, "maxshrink": 0.8},
}

SMOOTH_METHODS = tuple(SMOOTH_DEFAULTS)

_EPS = 1e-8


def _rowq(x: np.ndarray, p: float) -> np.ndarray:
    """Per-row linear-interpolated percentile over the last axis, keepdims.
    Matches reference ``_quantile`` (kthvalue + linear interpolation) ==
    numpy's default 'linear' quantile method."""
    if p <= 0.0:
        return x.min(axis=-1, keepdims=True)
    if p >= 100.0:
        return x.max(axis=-1, keepdims=True)
    return np.quantile(x, p / 100.0, axis=-1, keepdims=True, method="linear")


def _rowmed(x: np.ndarray) -> np.ndarray:
    """torch.median semantics: the LOWER of the two middle elements for even
    lengths (numpy averages them), keepdims over the last axis."""
    n = x.shape[-1]
    return np.sort(x, axis=-1)[..., (n - 1) // 2 : (n - 1) // 2 + 1]


def _smooth_chunks(blocks: np.ndarray, method: str, p: dict) -> np.ndarray:
    """blocks [out, nblk, g] -> smoothed, per-(row,chunk) over the g axis."""
    if method == "percentile":
        t = _rowq(np.abs(blocks), float(p["percentile"]))
        return np.clip(blocks, -t, t)
    if method == "percentile_asym":
        lo = _rowq(blocks, float(p["low"]))
        hi = _rowq(blocks, float(p["high"]))
        return np.minimum(np.maximum(blocks, lo), hi)
    if method == "mad":
        med = _rowmed(blocks)
        mad = _rowmed(np.abs(blocks - med)) * MAD_TO_STD_SCALE
        k = float(p["k"])
        return np.minimum(np.maximum(blocks, med - k * mad), med + k * mad)
    if method == "outlier":
        pct = float(p["pct"])
        if pct <= 0.0:
            return blocks
        n = blocks.shape[-1]
        k = max(1, int(round(n * (1.0 - pct / 100.0))))
        k = min(k, n)
        ab = np.sort(np.abs(blocks), axis=-1)
        t = ab[..., k - 1 : k]  # kth smallest |w| (1-indexed kthvalue)
        return np.clip(blocks, -t, t)
    if method == "softnorm":
        mean = blocks.mean(axis=-1, keepdims=True)
        rms = np.sqrt(((blocks - mean) ** 2).mean(axis=-1, keepdims=True))
        rms = np.maximum(rms, _EPS)
        k = float(p["k"])
        z = np.clip((blocks - mean) / rms, -k, k)
        return z * rms + mean
    if method == "log":
        mu = max(float(p["mu"]), _EPS)
        log_mu = math.log1p(mu)
        lv = np.log1p(np.abs(blocks) * mu) / log_mu
        t = _rowq(lv, float(p["percentile"]))
        lin = (np.exp(t * log_mu) - 1.0) / mu
        return np.clip(blocks, -lin, lin)
    raise ValueError(f"unknown smooth method: {method}")


def smooth_weight(
    W: np.ndarray,
    method,
    group_size: int,
    group_threshold: int = 0,
    **overrides,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Returns (W_smoothed, row_scale or None).

    ``method`` is a name from SMOOTH_METHODS (legacy aliases ``rms_row`` →
    rowcol/row) or a dict ``{"type": name, **params}``. ``row_scale`` [out]
    multiplies the dequantized result back (fold into quantization scales);
    clip methods return None (lossy range tightening). Skipped (identity)
    when ``0 < group_size < group_threshold`` — the reference
    ``group_size_threshold`` gate (config.py:886).
    """
    W = np.asarray(W, np.float32)
    out_f, in_f = W.shape
    g = in_f if group_size in (-1, None, 0) else int(group_size)

    if isinstance(method, dict):
        params = dict(method)
        name = params.pop("type", params.pop("name", None))
    else:
        name, params = str(method), {}
    if name == "rms_row":  # legacy alias
        name, params = "rowcol", {"axis": "row", **params}
    if name not in SMOOTH_DEFAULTS:
        raise ValueError(f"unknown smooth method: {name}")
    p = {**SMOOTH_DEFAULTS[name], **params, **overrides}
    # legacy kwarg alias from the round-1 API
    if "mad_k" in p:
        p["k"] = p.pop("mad_k")

    if group_threshold and g < group_threshold:
        return W, None

    if name == "rowcol":
        # per-chunk, like the reference fallback loop: each group-size column
        # chunk normalized independently, scale returned [n_groups, out] for
        # an exact fold into the per-group quantization scales
        axis = str(p.get("axis", "row")).lower()
        assert in_f % g == 0, (in_f, g)
        blocks = W.reshape(out_f, in_f // g, g)
        if axis == "col":
            col_rms = np.sqrt((blocks * blocks).mean(axis=0))  # [nblk, g]
            s = np.maximum(col_rms, _EPS).mean(axis=-1)  # scalar per chunk
            sc = np.broadcast_to(s[None, :, None], blocks.shape)
        else:
            rms = np.sqrt((blocks * blocks).mean(axis=-1, keepdims=True))
            sc = np.maximum(rms, _EPS)  # [out, nblk, 1]
        smoothed = (blocks / sc).reshape(out_f, in_f)
        return smoothed, np.ascontiguousarray(
            np.broadcast_to(sc, blocks.shape)[:, :, 0].T  # [n_groups, out]
        )

    if name == "mse":
        # fake-quant smoothing: replace W with its MSE-shrink quantized form
        return (
            mse_shrink_quant(
                W, bits=int(p.get("bits", 4)), sym=bool(p.get("sym", True)),
                group_size=g, steps=int(p["steps"]),
                maxshrink=float(p["maxshrink"]),
            )[0],
            None,
        )

    pad = (-in_f) % g
    if pad:
        Wp = np.pad(W, ((0, 0), (0, pad)))
        blocks = Wp.reshape(out_f, -1, g)
        # padded zeros perturb percentile stats of the last chunk; mask by
        # processing it at its true width like the reference's short tail
        body = _smooth_chunks(blocks[:, :-1], name, p).reshape(out_f, -1)
        tail = _smooth_chunks(W[:, in_f - (in_f % g):][:, None, :], name, p)
        return np.concatenate([body, tail[:, 0]], axis=1), None
    blocks = W.reshape(out_f, in_f // g, g)
    return _smooth_chunks(blocks, name, p).reshape(out_f, in_f), None


def _mse_err(blocks, lo, hi, base_zero, sym, maxq, shrink):
    """MSE for shrink candidates: blocks [R,1,g], shrink [R,S,1]."""
    scale = np.maximum((hi * shrink - lo * shrink) / maxq, _EPS)
    if sym:
        zero = np.broadcast_to(base_zero, scale.shape)
    else:
        zero = np.round(-lo * shrink / scale)
    q = np.clip(np.round(blocks / scale + zero), 0, maxq)
    return (((q - zero) * scale - blocks) ** 2).mean(axis=2)


def mse_shrink_quant(
    W: np.ndarray,
    bits: int,
    sym: bool,
    group_size: int,
    steps: int = 32,
    maxshrink: float = 0.8,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-(row,chunk) ternary search over the quant-range shrink factor,
    reference ``fallback_smooth.py::mse_optimal_quant`` numerics (ternary
    O(log steps) + 3-point refine). Returns (dequant, scale, zero), scale/
    zero shaped [out, n_chunks]."""
    W = np.asarray(W, np.float32)
    out_f, in_f = W.shape
    g = in_f if group_size in (-1, None, 0) else int(group_size)
    assert in_f % g == 0, (in_f, g)
    maxq = float(2**bits - 1)
    blocks = W.reshape(out_f, in_f // g, g).reshape(-1, g)  # rows = out*nblk
    R = blocks.shape[0]
    b = blocks[:, None, :]  # [R,1,g]

    if sym:
        mx = np.abs(blocks).max(axis=1, keepdims=True)
        lo, hi = -mx, mx
        base_zero = np.full_like(mx, (maxq + 1) / 2.0)
    else:
        lo = blocks.min(axis=1, keepdims=True)
        hi = blocks.max(axis=1, keepdims=True)
        base_zero = None
    lo3, hi3 = lo[:, None, :], hi[:, None, :]
    bz3 = None if base_zero is None else base_zero[:, None, :]

    n_steps = max(int(math.log(max(steps, 2)) / math.log(1.5)) + 1, 3)
    shrink = max(min(maxshrink, 1.0), 1e-3)
    l = np.full((R, 1), shrink, np.float32)
    r = np.ones((R, 1), np.float32)
    best_err = np.full((R,), np.inf, np.float32)
    best_p = r.copy()

    for _ in range(n_steps):
        m1 = l + (r - l) / 3.0
        m2 = r - (r - l) / 3.0
        cand = np.stack([m1, m2], axis=1)  # [R,2,1]
        err = _mse_err(b, lo3, hi3, bz3, sym, maxq, cand)
        for i, pcur in enumerate((m1, m2)):
            better = err[:, i] < best_err
            best_err = np.where(better, err[:, i], best_err)
            best_p = np.where(better[:, None], pcur, best_p)
        move_r = err[:, 0] < err[:, 1]
        r = np.where(move_r[:, None], m2, r)
        l = np.where(move_r[:, None], l, m1)

    delta = (r - l) * 0.1
    ref = np.stack(
        [np.clip(best_p - delta, shrink, 1.0), best_p,
         np.clip(best_p + delta, shrink, 1.0)], axis=1,
    )  # [R,3,1]
    idx = _mse_err(b, lo3, hi3, bz3, sym, maxq, ref).argmin(axis=1)
    best_p = ref[np.arange(R), idx]  # [R,1]

    scale = np.maximum((hi - lo) * best_p / maxq, _EPS)
    zero = base_zero if sym else np.round(-lo * best_p / scale)
    q = np.clip(np.round(blocks / scale + zero), 0, maxq)
    deq = ((q - zero) * scale).reshape(out_f, in_f)
    return (
        deq,
        scale.reshape(out_f, in_f // g),
        zero.reshape(out_f, in_f // g),
    )
