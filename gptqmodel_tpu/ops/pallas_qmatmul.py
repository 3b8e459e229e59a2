"""Pallas fused dequant-matmul — the TPU hot path.

Replaces the reference's entire CUDA kernel zoo (marlin/machete/swordfish/
exllama, SURVEY §2.6) with ONE kernel family: packed int codes are DMA'd to
VMEM, unpacked and dequantized in-register, and fed straight to the MXU —
HBM traffic is the packed bytes (bits/8 per weight), which is the roofline
that matters for decode.

Key layout trick (plane-major unpack): the GPTQ interchange word at row r,
bit-field j holds logical K-row ``r*pf + j``. Interleaving the pf shifted
"planes" back to logical row order is a large sublane shuffle over the whole
[kt, nt] block — the dominant cost of a naive kernel. Instead we keep the
unpacked block in plane-major order (a free concat along sublanes) and
permute the K-dim of the *activations* to match (a [M, K] reshape-transpose,
~N/ M× less data, fused into the caller's graph outside the kernel). Group
structure survives: in plane-major order, row ``p*R + r`` belongs to group
``r // (R/groups_per_tile)`` independent of the plane, so per-group scales
broadcast with a reshape — no gathers.

- ``K_tile`` covers >= 8 whole groups (Mosaic sublane rule) or all of K;
- dequant is ``codes * scale - zbias`` with ``zbias = scale*zero``
  precomputed at load (post-init analog, reference utils/model.py:1281);
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


def _qmm_kernel(x_ref, qw_ref, s_ref, zb_ref, o_ref, acc_ref, *, bits, kt, nt, gpk):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pf = 32 // bits
    R = kt // pf
    u = qw_ref[:].astype(jnp.uint32)  # [R, nt]
    mask = jnp.uint32((1 << bits) - 1)
    # plane-major unpack: concat along sublanes (no interleave)
    w = jnp.concatenate(
        [
            ((u >> jnp.uint32(bits * j)) & mask).astype(jnp.int32).astype(jnp.bfloat16)
            for j in range(pf)
        ],
        axis=0,
    )  # [kt, nt], row p*R + r = logical row r*pf + p (within this K-tile)
    # group of plane-major row = r // (R/gpk): broadcast scales by reshape
    rpg = R // gpk
    w = w.reshape(pf, gpk, rpg, nt)
    w = w * s_ref[:].astype(jnp.bfloat16)[None, :, None, :] - zb_ref[:].astype(
        jnp.bfloat16
    )[None, :, None, :]
    w = w.reshape(kt, nt)
    # x arrives pre-permuted to the same plane-major K order
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _plane_permute_x(x: jnp.ndarray, kt: int, pf: int) -> jnp.ndarray:
    """Permute the K axis of x to the kernel's per-tile plane-major order:
    xp[m, k_tile, p, r] = x[m, k_tile*kt + r*pf + p]."""
    M, K = x.shape
    R = kt // pf
    return x.reshape(M, K // kt, R, pf).transpose(0, 1, 3, 2).reshape(M, K)


def _pick_block_k(K: int, g: int, requested: int) -> int:
    """K-tile covering whole groups with an 8-divisible (or full) group dim."""
    if requested and requested % g == 0 and K % requested == 0 and (
        (requested // g) % 8 == 0 or requested == K
    ):
        return requested
    if K % (8 * g) == 0 and K // g >= 8:
        return 8 * g
    return K


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
    block_n: int = 512,
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

    bk = _pick_block_k(K, g, block_k)
    bm = block_m or (8 if M <= 8 else (128 if M >= 128 else _round_up(M, 8)))
    bn = min(block_n, N)
    gpk = bk // g

    xp = _plane_permute_x(x, bk, pf)
    grid = (_cdiv(N, bn), _cdiv(M, bm), _cdiv(K, bk))

    kernel = functools.partial(_qmm_kernel, bits=bits, kt=bk, nt=bn, gpk=gpk)
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
    )(xp, qweight, scales.astype(jnp.float32), zbias.astype(jnp.float32))
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
