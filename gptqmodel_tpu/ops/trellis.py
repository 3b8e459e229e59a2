"""EXL3 trellis-quantized linear: runtime pytree + forwards.

The on-disk layout is exllamav3's (reference nn_modules/exllamav3.py,
exl3_lib/quantize.py:1043): ``trellis`` int16 [k/16, n/16, 256*K/16]
(tensor-core-permuted Viterbi indices, span-packed), ``suh``/``svh`` fp16
input/output sign+scale vectors. The dense weight factorizes as

    W = diag(suh) . (I (x) H_128) . W~ . (I (x) H_128) . diag(svh)

so the forward is: scale by suh -> blockwise FHT(128) -> matmul with the
decoded W~ -> blockwise FHT(128) -> scale by svh (exl3_gemm.cu pipeline).

Two compute paths:
* convert (default): decode W~ once at post-init into a cached bf16 dense
  array (runtime-only, never exported) — the analog of our GPTQ convert
  path; the per-call cost is one MXU matmul plus two FHTs.
* decode-on-the-fly (``trellis_dequantize``): jit-safe lax.scan window
  reconstruction + table gather, used at load/export and as the executable
  reference.

A packed-STREAMING Pallas decode kernel (the exl3_gemm.cu analog, K
bits/weight off HBM) was resolved as a measured CUT in round 4
(scripts/tpu_session_exl3.py): the per-weight ring-window extraction +
procedural mcg codebook + m16n16 de-permutation sequence consumes packed
words at 46 GB/s on the v5e VPU = 92 Gweight/s, 0.26x the convert path's
350 Gweight/s (dense bf16 at the 700 GB/s wall). Unlike GPTQ's 1.5-op
magic unpack, trellis decode is ~13 VPU ops/weight — VPU-bound at ~7% of
the DMA wall, so on TPU the bandwidth saving can never be realized. The
dense convert path IS the fast path on this hardware (the CUDA kernel wins
on GPUs because lop3/XOR-shift pipelines decode in tensor-core-adjacent
ALUs at far higher integer throughput per byte of bandwidth).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gptqmodel_tpu.ops.hadamard import fht
from gptqmodel_tpu.quantization.exl3 import (
    HAD_K,
    HAD_N,
    codebook_table,
    tensor_core_perm_i,
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["trellis", "suh", "svh", "bias", "w_rt", "lora_A", "lora_B"],
    meta_fields=["K", "cb", "in_features", "out_features"],
)
@dataclasses.dataclass
class TrellisLinear:
    """EXL3 packed linear as a plain pytree (exllamav3 tensor layout)."""

    trellis: jnp.ndarray  # int16 [k/16, n/16, 256*K/16]
    suh: jnp.ndarray  # f16 [k]
    svh: jnp.ndarray  # f16 [n]
    bias: jnp.ndarray | None
    # runtime-only decoded W~ (regularized space) in bf16; set by
    # post_init_trellis, never serialized (writer skips it)
    w_rt: jnp.ndarray | None = None
    lora_A: jnp.ndarray | None = None
    lora_B: jnp.ndarray | None = None
    K: int = 4  # bits per weight
    cb: str = "mcg"  # codebook: "3inst" | "mcg" | "mul1"
    in_features: int = 0
    out_features: int = 0


def _unpack_windows_jnp(trellis: jnp.ndarray, K: int) -> jnp.ndarray:
    """Packed int16 words -> (T, 256) int32 codeword indices (jit-safe).

    Same ring-window reconstruction as quantization.exl3.unpack_trellis:
    undo the SWAP16 pair swap, extract the 256 K-bit chunks, then run a
    16-bit shift register two laps around the circular stream.
    """
    T = trellis.shape[0]
    w = trellis.reshape(T, 16 * K).view(jnp.uint16).astype(jnp.uint32)
    w = w.reshape(T, 8 * K, 2)[:, :, ::-1].reshape(T, 16 * K)
    w_ext = jnp.concatenate([w, jnp.zeros((T, 1), jnp.uint32)], axis=1)
    pos = np.arange(256) * K
    wi, off = pos >> 4, pos & 15
    combined = (w_ext[:, wi] << 16) | w_ext[:, wi + 1]  # (T, 256)
    chunks = (combined >> jnp.asarray(32 - off - K, jnp.uint32)) & ((1 << K) - 1)

    def lap(win, c):
        win = ((win << K) | c) & 0xFFFF
        return win, win

    win0 = jnp.zeros(T, jnp.uint32)
    win1, _ = jax.lax.scan(lap, win0, chunks.T)
    _, enc = jax.lax.scan(lap, win1, chunks.T)
    return enc.T.astype(jnp.int32)  # (T, 256)


def trellis_decode_wtilde(p: TrellisLinear, dtype=jnp.float32) -> jnp.ndarray:
    """Decode the trellis to the regularized-space dense W~ [k, n]."""
    tk = p.in_features // 16
    tn = p.out_features // 16
    enc = _unpack_windows_jnp(p.trellis.reshape(tk * tn, -1), p.K)
    table = jnp.asarray(codebook_table(p.cb))
    vals = table[enc][:, jnp.asarray(tensor_core_perm_i())]
    return (
        vals.reshape(tk, tn, 16, 16)
        .transpose(0, 2, 1, 3)
        .reshape(p.in_features, p.out_features)
        .astype(dtype)
    )


def trellis_dequantize(p: TrellisLinear, dtype=jnp.float32) -> jnp.ndarray:
    """Full dense reconstruction W [k, n] (export / reference path)."""
    W = trellis_decode_wtilde(p, jnp.float32)
    W = fht(W.T, HAD_K).T * p.suh.astype(jnp.float32)[:, None]
    W = fht(W, HAD_N) * p.svh.astype(jnp.float32)[None, :]
    return W.astype(dtype)


def trellis_forward(p: TrellisLinear, x: jnp.ndarray) -> jnp.ndarray:
    """y = ((x . suh) FHT) @ W~ then FHT . svh  (+ lora, + bias)."""
    xt = fht(x * p.suh.astype(x.dtype), HAD_K)
    if p.w_rt is not None:
        w = p.w_rt.astype(x.dtype)
    else:
        w = trellis_decode_wtilde(p, x.dtype)
    y = fht(xt @ w, HAD_N) * p.svh.astype(x.dtype)
    if p.lora_A is not None:  # adapters live in the ORIGINAL input space
        y = y + (x @ p.lora_A.astype(x.dtype)) @ p.lora_B.astype(x.dtype)
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y


def post_init_trellis(p: TrellisLinear) -> TrellisLinear:
    """Decode W~ once into a cached bf16 runtime array (convert path)."""
    if p.w_rt is not None:
        return p
    w = trellis_decode_wtilde(p, jnp.bfloat16)
    return dataclasses.replace(p, w_rt=w)


def make_trellis_linear(
    *, trellis, suh, svh, bias, K: int, cb: str
) -> TrellisLinear:
    tk, tn, pw = trellis.shape
    assert pw == 16 * K
    return TrellisLinear(
        trellis=jnp.asarray(np.asarray(trellis).view(np.int16)),
        suh=jnp.asarray(suh),
        svh=jnp.asarray(svh),
        bias=None if bias is None else jnp.asarray(bias),
        K=K,
        cb=cb,
        in_features=tk * 16,
        out_features=tn * 16,
    )
