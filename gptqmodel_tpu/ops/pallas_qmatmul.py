"""Pallas fused dequant-matmul — the TPU hot path.

Replaces the reference's entire CUDA kernel zoo (marlin/machete/swordfish/
exllama, SURVEY §2.6) with ONE kernel family: packed int codes are DMA'd to
VMEM, unpacked and dequantized in-register, and fed straight to the MXU —
HBM traffic is the packed bytes (bits/8 per weight), which is the roofline
that matters for decode.

Design:
- operates directly on the GPTQ interchange ``qweight int32 [K/pf, N]``
  layout (no repack pass needed, unlike marlin's tile-interleave);
- ``K_tile == group_size`` (or a multiple) so each K-step sees whole groups;
  dequant is a fused multiply-subtract ``w = codes * scale - zbias`` with
  ``zbias = scale * zero`` precomputed once at load (post-init analog,
  reference utils/model.py:1281);
- grid (N, M, K) with K innermost accumulating into a VMEM f32 scratch;
- contiguous groups required (GAR composes its perms away; desc_act imports
  fall back to the XLA reference path — SURVEY §7 "hard parts").

Supports bits ∈ {2, 4, 8}. 3-bit stays on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _unpack_block(qw, bits: int, kt: int, nt: int):
    """[kt/pf, nt] int32 words -> [kt, nt] int32 codes (logical row order).

    Word row r, bit-field j holds logical row ``r*pf + j``; stacking the
    shifted nibble planes on a new minor axis then reshaping restores
    logical order as a sublane interleave.
    """
    pf = 32 // bits
    u = qw.astype(jnp.uint32)
    mask = jnp.uint32((1 << bits) - 1)
    planes = [
        ((u >> jnp.uint32(bits * j)) & mask).astype(jnp.int32) for j in range(pf)
    ]
    return jnp.stack(planes, axis=1).reshape(kt, nt)


def _qmm_kernel(x_ref, qw_ref, s_ref, zb_ref, o_ref, acc_ref, *, bits, kt, nt, groups_per_kt):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = _unpack_block(qw_ref[:], bits, kt, nt)  # [kt, nt] int32
    s = s_ref[:]  # [groups_per_kt, nt] f32
    zb = zb_ref[:]  # [groups_per_kt, nt] f32
    g_rows = kt // groups_per_kt
    w = codes.reshape(groups_per_kt, g_rows, nt).astype(jnp.float32)
    w = w * s[:, None, :] - zb[:, None, :]
    w = w.reshape(kt, nt).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "block_m", "block_n", "block_k", "interpret"),
)
def qmatmul(
    x: jnp.ndarray,  # [M, K] (bf16/f32)
    qweight: jnp.ndarray,  # [K/pf, N] int32 (GPTQ interchange layout)
    scales: jnp.ndarray,  # [G, N]
    zbias: jnp.ndarray,  # [G, N] f32 = scales * zeros
    *,
    bits: int,
    group_size: int,
    block_m: int = 0,
    block_n: int = 256,
    block_k: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused dequant-matmul ``y = x @ dequant(qweight)`` for contiguous groups."""
    M, K = x.shape
    pf = 32 // bits
    N = qweight.shape[1]
    G = scales.shape[0]
    g = group_size if group_size > 0 else K
    assert qweight.shape[0] * pf == K, (qweight.shape, K, bits)
    assert G * g == K, (G, g, K)

    bk = block_k or min(max(g, 256), K)
    if bk % g or K % bk:  # block must cover whole groups and tile K exactly
        bk = g
    bm = block_m or (8 if M <= 8 else (128 if M >= 128 else _round_up(M, 8)))
    bn = min(block_n, N)
    gpk = bk // g

    grid = (_cdiv(N, bn), _cdiv(M, bm), _cdiv(K, bk))

    kernel = functools.partial(
        _qmm_kernel, bits=bits, kt=bk, nt=bn, groups_per_kt=gpk
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda n, m, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bk // pf, bn), lambda n, m, k: (k, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((gpk, bn), lambda n, m, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpk, bn), lambda n, m, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda n, m, k: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(
                M * K * x.dtype.itemsize + K * N * bits // 8 + M * N * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qweight, scales.astype(jnp.float32), zbias.astype(jnp.float32))
    return out


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def supports(bits: int, group_size: int, in_features: int, out_features: int,
             g_idx_is_none: bool) -> bool:
    """Capability contract of the Pallas kernel (analog of the reference's
    SUPPORTS_* class attrs, qlinear/__init__.py:73)."""
    if bits not in (2, 4, 8):
        return False
    if not g_idx_is_none:
        return False  # desc_act imports use the XLA path
    g = group_size if group_size > 0 else in_features
    if in_features % g:
        return False
    if g % (32 // bits):
        return False
    # lane alignment: scales/qweight last dim must tile to 128 lanes
    return out_features % 128 == 0 and g % 8 == 0
