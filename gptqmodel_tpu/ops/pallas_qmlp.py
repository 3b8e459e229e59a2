"""Fused quantized MLP Pallas kernel: gate_up matmul + activation + down
matmul in ONE kernel launch.

Decode is weight-streaming-bound and per-kernel boundaries cost bubbles: the
separate gate_up and down dequant-matmul calls (ops/pallas_qmatmul.qmatmul)
leave the MXU/DMA idle between launches and round-trip the inner activation
through HBM. This kernel streams all three packed projections exactly once
per token step with no intermediate HBM traffic:

    for each F-tile ft (grid):
        g  = x @ deq(W_gate[:, ft])     # full-D contraction, rt partial dots
        u  = x @ deq(W_up[:, ft])
        inner = act(g) * u              # in-register, bf16
        acc  += inner @ deq(W_down[ft, :])   # one 8-group rt tile
    y = acc                              # written at the last tile

Layout contract (same rt layout as pallas_qmatmul, sym fast path):
- gate/up ride in ONE fused gate_up module ([D, 2F], gate cols first —
  optimize.fuse_projections order); the kernel reads gate and up column
  blocks as two BlockSpec views of the same array (zero copies).
- rt repack tiles: gate_up any tile dividing D (the kernel iterates tiles
  in-register); down tile MUST equal the kernel F-tile ``bf = 8*g`` —
  optimize.enable_fused_mlp re-repacks down to that tile.
- sym quant only (uniform zero_const), bf16 scales, bits ∈ {2, 4}.

Reference parity: this replaces the reference's per-projection CUDA GEMM
calls in its fused-MLP-free decode path (there is no reference equivalent —
kernel-boundary fusion of the whole MLP is TPU-specific headroom).
VMEM at llama-8B shapes (D=4096, bf=1024, 4-bit): ~6.2 MB/step live,
~12.6 MB with double buffering — inside the 16 MB budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptqmodel_tpu.ops.pallas_qmatmul import _MAGIC_BF16, _MAGIC_OFFSET


def _act_fn(name: str):
    return {
        "silu": jax.nn.silu,
        "gelu": jax.nn.gelu,
        "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
        "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
        "relu": lambda x: jnp.maximum(x, 0.0),
    }[name]


def _rt_contract(x, u, sf, *, bits, kt, g, zero_const, out_cols):
    """Σ_groups s_g ⊙ (x_g @ codes_g) − (Σx_g)(zc+128)·s_g  over all K-tiles
    resident in ``u`` ([K/pf, out_cols] uint32, rt layout, tile ``kt``)."""
    pf = 32 // bits
    fmask, magic = _MAGIC_BF16[bits]
    M = x.shape[0]
    K = u.shape[0] * pf
    Rt = kt // pf
    gpt = kt // g  # groups per tile
    gpp = (2 * Rt) // g  # groups per magic part
    acc = jnp.zeros((M, out_cols), jnp.float32)
    for t in range(K // kt):
        ut = u[t * Rt : (t + 1) * Rt]
        for a in range(pf // 2):
            tt = ((ut >> jnp.uint32(bits * a)) & jnp.uint32(fmask)) | jnp.uint32(magic)
            wa = pltpu.bitcast(tt.astype(jnp.int32), jnp.bfloat16)  # [2Rt, nc]
            for gi in range(gpp):
                g_abs = t * gpt + a * gpp + gi
                xg = x[:, g_abs * g : (g_abs + 1) * g]
                P = jnp.dot(
                    xg, wa[gi * g : (gi + 1) * g],
                    preferred_element_type=jnp.float32,
                )
                X1 = jnp.sum(xg.astype(jnp.float32), axis=1)
                sg = sf[g_abs][None, :]
                acc += (P - jnp.float32(zero_const + _MAGIC_OFFSET) * X1[:, None]) * sg
    return acc


def _qmlp_kernel(
    x_ref, qwg_ref, sg_ref, qwu_ref, su_ref, qwd_ref, sd_ref, o_ref, acc_ref,
    *, bits, kt_gu, bf, g, zc_gu, zc_d, act,
):
    f = pl.program_id(0)
    nf = pl.num_programs(0)

    @pl.when(f == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)  # [M, D]
    gacc = _rt_contract(
        x, qwg_ref[:].astype(jnp.uint32), sg_ref[:].astype(jnp.float32),
        bits=bits, kt=kt_gu, g=g, zero_const=zc_gu, out_cols=bf,
    )
    uacc = _rt_contract(
        x, qwu_ref[:].astype(jnp.uint32), su_ref[:].astype(jnp.float32),
        bits=bits, kt=kt_gu, g=g, zero_const=zc_gu, out_cols=bf,
    )
    inner = (_act_fn(act)(gacc) * uacc).astype(jnp.bfloat16)  # [M, bf]
    acc_ref[:] += _rt_contract(
        inner, qwd_ref[:].astype(jnp.uint32), sd_ref[:].astype(jnp.float32),
        bits=bits, kt=bf, g=g, zero_const=zc_d, out_cols=acc_ref.shape[1],
    )

    @pl.when(f == nf - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def qmlp_supported(
    *, bits, group_size, D, F, gu_rt_block_k, d_rt_block_k, M
) -> bool:
    """Eligibility: magic-bits sym rt modules, F tiled by 8 whole groups with
    the down repack tile matching, decode-sized M."""
    if bits not in _MAGIC_BF16:
        return False
    g = group_size if group_size > 0 else D
    bf = 8 * g
    return (
        g % 128 == 0
        and F % bf == 0
        and d_rt_block_k == bf
        and gu_rt_block_k > 0
        and D % gu_rt_block_k == 0
        and M <= 64
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits", "group_size", "kt_gu", "zc_gu", "zc_d", "act", "interpret",
    ),
)
def qmlp(
    x: jnp.ndarray,  # [M, D]
    qw_gu: jnp.ndarray,  # [D/pf, 2F] int32, rt layout (tile kt_gu)
    s_gu: jnp.ndarray,  # [D/g, 2F]
    qw_d: jnp.ndarray,  # [F/pf, D] int32, rt layout (tile 8*g)
    s_d: jnp.ndarray,  # [F/g, D]
    *,
    bits: int,
    group_size: int,
    kt_gu: int,
    zc_gu: float,
    zc_d: float,
    act: str = "silu",
    interpret: bool = False,
) -> jnp.ndarray:
    M, D = x.shape
    pf = 32 // bits
    g = group_size if group_size > 0 else D
    F = qw_gu.shape[1] // 2
    bf = 8 * g
    nf = F // bf
    assert qw_d.shape == (F // pf, D), (qw_d.shape, F, D)
    assert F % bf == 0 and D % kt_gu == 0

    grid = (nf,)
    blk_gu = (D // pf, bf)
    blk_sgu = (D // g, bf)
    out = pl.pallas_call(
        functools.partial(
            _qmlp_kernel, bits=bits, kt_gu=kt_gu, bf=bf, g=g,
            zc_gu=float(zc_gu), zc_d=float(zc_d), act=act,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, D), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_gu, lambda f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_sgu, lambda f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_gu, lambda f: (0, nf + f), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_sgu, lambda f: (0, nf + f), memory_space=pltpu.VMEM),
            pl.BlockSpec((bf // pf, D), lambda f: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, D), lambda f: (f, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, D), lambda f: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * D * F * 3,
            bytes_accessed=(
                M * D * x.dtype.itemsize + 3 * D * F * bits // 8
                + M * D * x.dtype.itemsize
            ),
            transcendentals=M * F,
        ),
        interpret=interpret,
    )(
        x, qw_gu, s_gu.astype(jnp.bfloat16), qw_gu, s_gu.astype(jnp.bfloat16),
        qw_d, s_d.astype(jnp.bfloat16),
    )
    return out
