"""bitsandbytes NF4 checkpoint import (4-bit NormalFloat).

Reference parity: nn_modules/qlinear/bitsandbytes.py wraps the external bnb
package; this environment (and TPUs generally) has no bitsandbytes, so the
on-disk format is decoded directly:

- ``{mod}.weight``: uint8 [numel/2, 1], byte i = (code[2i] << 4) | code[2i+1]
  (FIRST element in the HIGH nibble — bnb quantize_4bit packing).
- ``{mod}.weight.quant_map``: f32 [16] NF4 code values.
- ``{mod}.weight.absmax``: per-``blocksize``-block scales; either f32
  directly, or uint8 when double-quantized ("nested"):
  ``absmax = nested_quant_map[absmax_u8] * nested_absmax[i // nested_blocksize]
  + nested_offset``.
- ``{mod}.weight.quant_state.bitsandbytes__nf4``: uint8-packed JSON with
  blocksize / shape / nested_offset / ...

Serving keeps the packed codes (Bnb4Linear pytree) and dequantizes on the
fly like the FP4 path.
"""

from __future__ import annotations

import dataclasses
import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# canonical NF4 code values (bitsandbytes functional.py create_normal_map)
NF4_LUT = np.asarray(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    np.float32,
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["codes_u8", "absmax", "quant_map", "bias"],
    meta_fields=["in_features", "out_features", "blocksize"],
)
@dataclasses.dataclass
class Bnb4Linear:
    """Packed NF4 weights: per-block absmax already dequantized to f32."""

    codes_u8: jnp.ndarray  # uint8 [numel/2]
    absmax: jnp.ndarray  # f32 [numel/blocksize]
    quant_map: jnp.ndarray  # f32 [16]
    bias: jnp.ndarray | None
    in_features: int = 0
    out_features: int = 0
    blocksize: int = 64


def parse_quant_state(raw_u8: np.ndarray) -> dict:
    """The quant_state tensor is JSON bytes stored as a uint8 array."""
    return json.loads(bytes(np.asarray(raw_u8, np.uint8)).decode("utf-8"))


def dequant_nested_absmax(
    absmax_u8: np.ndarray,
    nested_quant_map: np.ndarray,
    nested_absmax: np.ndarray,
    nested_offset: float,
    nested_blocksize: int = 256,
) -> np.ndarray:
    """Double-quantized absmax -> f32 per-block scales."""
    a = np.asarray(nested_quant_map, np.float32)[np.asarray(absmax_u8, np.int64)]
    blk = np.arange(len(a)) // nested_blocksize
    return a * np.asarray(nested_absmax, np.float32)[blk] + np.float32(nested_offset)


def make_bnb4_linear(
    packed: np.ndarray,
    absmax: np.ndarray,
    quant_map: np.ndarray,
    shape: tuple[int, int],
    blocksize: int = 64,
    bias: np.ndarray | None = None,
) -> Bnb4Linear:
    out_f, in_f = shape
    return Bnb4Linear(
        codes_u8=np.ascontiguousarray(np.asarray(packed, np.uint8).reshape(-1)),
        absmax=np.asarray(absmax, np.float32).reshape(-1),
        quant_map=np.asarray(quant_map, np.float32),
        bias=bias,
        in_features=in_f,
        out_features=out_f,
        blocksize=blocksize,
    )


def nf4_quantize(
    W: np.ndarray,
    blocksize: int = 64,
    bias: np.ndarray | None = None,
) -> Bnb4Linear:
    """Quantize a dense weight to NF4 (bnb ``quantize_4bit`` semantics:
    per-block absmax scale, nearest NF4 code, first element in the HIGH
    nibble). The quantize direction of the reference's BitsAndBytes path
    (quantization/config.py METHOD.BITSANDBYTES,
    nn_modules/qlinear/bitsandbytes.py) — implemented host-side since TPUs
    have no bnb CUDA kernels; the import/forward side lives above."""
    W = np.asarray(W, np.float32)
    out_f, in_f = W.shape
    flat = W.reshape(-1)
    if flat.size % blocksize:
        raise ValueError(
            f"weight numel {flat.size} not divisible by blocksize {blocksize}"
        )
    blocks = flat.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1)
    normed = blocks / np.maximum(absmax, 1e-12)[:, None]
    # nearest code via midpoint bins (LUT is sorted): argmin|x - lut| ==
    # searchsorted over midpoints — O(n log 16) instead of an n x 16 table
    mids = (NF4_LUT[1:] + NF4_LUT[:-1]) / 2.0
    codes = np.searchsorted(mids, normed.reshape(-1)).astype(np.uint8)
    packed = ((codes[0::2] << 4) | codes[1::2]).astype(np.uint8)
    return make_bnb4_linear(
        packed, absmax, NF4_LUT, (out_f, in_f), blocksize=blocksize,
        bias=bias,
    )


def dequantize_bnb4(p: Bnb4Linear, dtype=jnp.float32) -> jnp.ndarray:
    """Dense [out, in] reconstruction (row-major element order, HF layout)."""
    u = p.codes_u8.astype(jnp.int32)
    hi = u >> 4  # element 2i
    lo = u & 0xF  # element 2i+1
    codes = jnp.stack([hi, lo], axis=-1).reshape(-1)
    lut = p.quant_map.astype(dtype)
    vals = lut[codes]
    scale = jnp.repeat(p.absmax.astype(dtype), p.blocksize)[: vals.shape[0]]
    return (vals * scale).reshape(p.out_features, p.in_features)


def bnb4_forward(p: Bnb4Linear, x: jnp.ndarray) -> jnp.ndarray:
    w = dequantize_bnb4(
        p, jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    )
    y = x @ w.T.astype(x.dtype)
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y
