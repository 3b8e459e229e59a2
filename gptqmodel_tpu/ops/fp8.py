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
