"""FP8 (e4m3) weight-only quantization — param type + quantizer + forward.

Analog of the reference FP8 path (quantization/dtype.py:595
``dequantize_f8_e4m3``, nn_modules/qlinear/fp8.py): weights stored as
float8_e4m3 with a per-output-channel f32 scale, compute upcast to bf16 on
the fly (XLA handles the f8->bf16 convert natively on TPU).

Storage note: safetensors' numpy front-end cannot serialize f8 dtypes, so
checkpoints store the raw e4m3 bit pattern as uint8 (``.weight`` with
``fp8_storage: "e4m3-u8"`` recorded in quantize_config); jnp views it back.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

F8_MAX = 448.0  # e4m3fn max normal


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["weight_u8", "scale", "bias"],
    meta_fields=["in_features", "out_features"],
)
@dataclasses.dataclass
class Fp8Linear:
    """f8 weight bits (uint8 view) + per-out-channel scale; y = x @ (f8*s)ᵀ."""

    weight_u8: jnp.ndarray  # uint8 [out, in] e4m3 bit pattern
    scale: jnp.ndarray  # f32 [out]
    bias: jnp.ndarray | None
    in_features: int = 0
    out_features: int = 0


def quantize_fp8(W: np.ndarray) -> Fp8Linear:
    """Per-output-channel absmax scaling onto the e4m3 grid."""
    W = np.asarray(W, np.float32)
    absmax = np.abs(W).max(axis=1)
    scale = np.maximum(absmax / F8_MAX, 1e-12).astype(np.float32)
    w8 = (W / scale[:, None]).astype(ml_dtypes.float8_e4m3fn)
    return Fp8Linear(
        weight_u8=w8.view(np.uint8),
        scale=scale,
        bias=None,
        in_features=W.shape[1],
        out_features=W.shape[0],
    )


def dequantize_fp8(p: Fp8Linear, dtype=jnp.float32) -> jnp.ndarray:
    """Dense [out, in] reconstruction."""
    w8 = jax.lax.bitcast_convert_type(
        jnp.asarray(p.weight_u8), jnp.float8_e4m3fn
    )
    return w8.astype(dtype) * jnp.asarray(p.scale, dtype)[:, None]


def fp8_forward(p: Fp8Linear, x: jnp.ndarray) -> jnp.ndarray:
    w8 = jax.lax.bitcast_convert_type(
        jnp.asarray(p.weight_u8), jnp.float8_e4m3fn
    )
    w = w8.astype(x.dtype) * jnp.asarray(p.scale, x.dtype)[:, None]
    y = x @ w.T
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y


# --------------------------------------------------------------------------
# FP4 (e2m1) weight-only — per-group scales (reference dtype.py f4_e2m1)
# --------------------------------------------------------------------------

# e2m1 magnitude grid (sign in bit 3): codes 0..7 -> |value|
F4_GRID = np.asarray([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)
F4_MAX = 6.0
# decision midpoints between adjacent grid values for nearest-value encode
_F4_MIDS = (F4_GRID[1:] + F4_GRID[:-1]) / 2.0


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["codes_u8", "scales", "bias"],
    meta_fields=["in_features", "out_features", "group_size"],
)
@dataclasses.dataclass
class Fp4Linear:
    """Packed e2m1 nibbles + per-(group, out) f16 scales.

    ``codes_u8`` [in/2, out]: byte at row r holds input rows 2r (lo nibble)
    and 2r+1 (hi); dequant ``w[i, o] = lut[code] * scales[i // g, o]``
    (transposed layout, y = x @ w — matches the GPTQ tensor convention).
    """

    codes_u8: jnp.ndarray  # uint8 [in/2, out]
    scales: jnp.ndarray  # f16 [G, out]
    bias: jnp.ndarray | None
    in_features: int = 0
    out_features: int = 0
    group_size: int = 128


def quantize_fp4(W: np.ndarray, group_size: int = 128) -> Fp4Linear:
    """Per-group absmax onto the e2m1 grid; nearest-value rounding."""
    W = np.asarray(W, np.float32)
    out_f, in_f = W.shape
    g = in_f if group_size in (-1, None) else group_size
    assert in_f % g == 0 and in_f % 2 == 0, (in_f, g)
    Wt = W.T  # [in, out]
    grp = Wt.reshape(in_f // g, g, out_f)
    scale = np.maximum(np.abs(grp).max(axis=1) / F4_MAX, 1e-12)  # [G, out]
    normed = grp / scale[:, None, :]
    mag = np.minimum(np.abs(normed), F4_MAX)
    m = np.searchsorted(_F4_MIDS, mag.reshape(-1)).reshape(mag.shape)
    codes = (m | ((normed < 0) << 3)).astype(np.uint8).reshape(in_f, out_f)
    packed = codes[0::2] | (codes[1::2] << 4)  # [in/2, out]
    return Fp4Linear(
        codes_u8=np.ascontiguousarray(packed),
        # note: astype keeps memory order — force C order (safetensors
        # save_file writes the raw buffer and silently scrambles F-ordered
        # arrays)
        scales=np.ascontiguousarray(scale.astype(np.float16)),
        bias=None,
        in_features=in_f,
        out_features=out_f,
        group_size=group_size,
    )


def dequantize_fp4(p: Fp4Linear, dtype=jnp.float32) -> jnp.ndarray:
    """Dense [in, out] reconstruction (y = x @ w layout)."""
    u = jnp.asarray(p.codes_u8)
    lo = u & 0xF
    hi = u >> 4
    codes = jnp.stack([lo, hi], axis=1).reshape(p.in_features, p.out_features)
    lut = jnp.asarray(F4_GRID, dtype)
    mag = lut[codes & 0x7]
    vals = jnp.where(codes >= 8, -mag, mag)
    g = p.in_features if p.group_size in (-1, None) else p.group_size
    s = jnp.repeat(p.scales.astype(dtype), g, axis=0)
    return vals * s


def fp4_forward(p: Fp4Linear, x: jnp.ndarray) -> jnp.ndarray:
    w = dequantize_fp4(p, jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32)
    y = x @ w.astype(x.dtype)
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y
