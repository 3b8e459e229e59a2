"""Fused decode-attention Pallas kernel.

Decode (T=1) attention in ONE kernel per layer instead of XLA's
logits-einsum → mask-add → softmax → weighted-sum chain (plus GQA
reshapes): for each (batch, kv-head) grid cell the query group [rep, D]
reads its K/V span [L, D] once from HBM, computes masked softmax in
registers, and writes [rep, D]. Replaces ~5 launches + two [B,H,L]
intermediate HBM round-trips per layer with one launch and zero
intermediates — the decode-path overhead identified in the round-1 bench
(attention einsums dominate the non-weight 12% of step time).

The int8-KV variant dequantizes the cache in-register (per-(b,h,pos)
scales, see transformer._kv_quantize), halving attention HBM reads on top
of the cache-size saving.

The KV-cache scatter (dynamic_update_slice) stays in XLA: re-writing the
[L, D] block from a kernel would stream the whole cache back out, whereas
XLA's DUS updates one row in place.

Reference analog: the CUDA kernels delegate decode attention to HF/vLLM;
this is new TPU-native design work (SURVEY §7 step 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: K + V blocks ([L, D] bf16 each) must fit comfortably
_MAX_L_D = 4096 * 128


def _decode_attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0, 0]  # [rep, D]
    k = k_ref[0, 0]  # [L, D]
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [rep, L]
    # bias block is the full [B, L] (Mosaic: a (1, L) block would violate
    # the sublane-divisibility rule); pick this cell's row by grid index
    logits = logits + bias_ref[pl.program_id(0)][None, :]
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=1, keepdims=True)
    pv = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (pv / s).astype(o_ref.dtype)


def _decode_attn_kernel_i8(
    q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref, o_ref, *, scale
):
    """int8 KV: dequantize k/v rows in-register with per-position scales."""
    q = q_ref[0, 0]  # [rep, D] bf16
    ks = ks_ref[0, 0][0]  # [L] f32
    vs = vs_ref[0, 0][0]
    k = k_ref[0, 0].astype(jnp.bfloat16)  # int8 -> bf16 (exact, |x|<=127)
    v = v_ref[0, 0].astype(jnp.bfloat16)
    # fold the k scale into the f32 logits (exact), the v scale into pv
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale * ks[None, :]
    logits = logits + bias_ref[pl.program_id(0)][None, :]
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=1, keepdims=True)
    pw = (p * vs[None, :]).astype(jnp.bfloat16)
    pv = jnp.dot(pw, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (pv / s).astype(o_ref.dtype)


def supports(L: int, D: int, softcap: float) -> bool:
    """Kernel contract: lane-aligned head dim, VMEM-bounded span, no
    softcap (gemma2 falls back to the XLA path)."""
    return D % 128 == 0 and L * D <= _MAX_L_D and not softcap


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def decode_attention(
    q: jnp.ndarray,  # [B, Hkv, rep, D] (post-rope query groups)
    k_cache: jnp.ndarray,  # [B, Hkv, L, D] bf16 | int8
    v_cache: jnp.ndarray,
    bias: jnp.ndarray,  # [B, L] additive f32 (0 / -inf), slot already valid
    k_scale: jnp.ndarray | None = None,  # [B, Hkv, L] f32 (int8 cache)
    v_scale: jnp.ndarray | None = None,
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:  # [B, Hkv, rep, D]
    B, Hkv, rep, D = q.shape
    L = k_cache.shape[2]
    grid = (B, Hkv)
    q_spec = pl.BlockSpec(
        (1, 1, rep, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, 1, L, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    bias_spec = pl.BlockSpec((B, L), lambda b, h: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, 1, rep, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    common = dict(
        grid=grid,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Hkv * rep * L * D,
            bytes_accessed=B * Hkv * L * D * 2 * k_cache.dtype.itemsize,
            transcendentals=B * Hkv * rep * L,
        ),
        interpret=interpret,
    )
    if k_cache.dtype == jnp.int8:
        s_spec = pl.BlockSpec(
            (1, 1, 1, L), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
        )
        kernel = functools.partial(_decode_attn_kernel_i8, scale=scale)
        return pl.pallas_call(
            kernel,
            in_specs=[q_spec, kv_spec, kv_spec, s_spec, s_spec, bias_spec],
            **common,
        )(
            q, k_cache, v_cache,
            k_scale[:, :, None, :].astype(jnp.float32),
            v_scale[:, :, None, :].astype(jnp.float32),
            bias.astype(jnp.float32),
        )
    kernel = functools.partial(_decode_attn_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
        **common,
    )(q, k_cache, v_cache, bias.astype(jnp.float32))
