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
- dequant is ``(codes - zvals) * scale`` with ``zvals`` the float zero
  points prepared at load (post-init analog, reference utils/model.py:1281);
  the subtraction happens in the exact bf16 integer domain;
- grid (N, M, K) with K innermost accumulating into a VMEM f32 scratch;
- contiguous groups required (GAR composes its perms away; desc_act imports
  fall back to the XLA reference path — SURVEY §7 "hard parts").

Supports bits ∈ {2, 4, 8} everywhere; 3-bit runs the rt sym fast path
(plane-split repack, _qmm_rt3_sym_kernel) and falls back to XLA otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# bf16 magic: 0x4300 | n == bf16(128 + n) exactly for n in [0, 15] (7-bit
# mantissa, exponent 2^7 => ulp 1). The +128 offset folds into zvals.
_MAGIC_BF16 = {
    4: (0x000F000F, 0x43004300),
    2: (0x00030003, 0x43004300),
}
_MAGIC_OFFSET = 128.0


def _qmm_kernel(x_ref, qw_ref, s_ref, zb_ref, o_ref, acc_ref, *, bits, kt, nt, gpk):
    """Fused dequant-matmul block. For 2/4-bit, dequant is marlin-style magic
    arithmetic: each ``(u >> bits*a) & 0x000F000F | 0x43004300`` builds TWO
    bf16 codes (+128) per int32 word in 3 integer ops and one bitcast — no
    int->float converts. The sublane-halving bitcast emits rows ``2r+h``
    (h = lo/hi half = logical planes a and a+pf/2), a fixed K-permutation
    absorbed by ``_plane_permute_x`` on the activations."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pf = 32 // bits
    R = kt // pf
    u = qw_ref[:].astype(jnp.uint32)  # [R, nt]
    x = x_ref[:].astype(jnp.bfloat16)  # pre-permuted to the kernel's K order
    acc = acc_ref[:]
    bm = x.shape[0]
    if bits in _MAGIC_BF16:
        # Subtract the zero in the EXACT bf16 integer domain BEFORE scaling:
        # (codes+128) and (zeros+128) are exact bf16 integers (<= 256, ulp
        # 1), so their difference is exact and only the final *scale rounds —
        # the s-first order would cancel catastrophically.
        # NOTE(next round): a group-aligned custom repack would make each
        # bit-plane part cover whole groups, enabling a per-group partial-dot
        # formulation with NO per-element scale work (Mosaic rejects the
        # in-kernel lane-split reshapes the interchange layout would need).
        fmask, magic = _MAGIC_BF16[bits]
        s = s_ref[:].astype(jnp.bfloat16)[:, None, :]  # [gpk, 1, nt]
        zoff = (zb_ref[:] + _MAGIC_OFFSET).astype(jnp.bfloat16)[:, None, :]
        rpg = (2 * R) // gpk  # rows per group (uniform, plane-independent)
        for a in range(pf // 2):
            t = ((u >> jnp.uint32(bits * a)) & jnp.uint32(fmask)) | jnp.uint32(magic)
            wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16)  # [2R, nt]
            wa = ((wa.reshape(gpk, rpg, nt) - zoff) * s).reshape(2 * R, nt)
            # accumulate per part — no concat pass, 2R-contraction dots
            acc += jnp.dot(
                x[:, a * 2 * R : (a + 1) * 2 * R], wa,
                preferred_element_type=jnp.float32,
            )
    else:  # 8-bit: shift/and/convert planes (codes <= 255 still bf16-exact)
        mask = jnp.uint32((1 << bits) - 1)
        s = s_ref[:].astype(jnp.bfloat16)[:, None, :]
        z = zb_ref[:].astype(jnp.bfloat16)[:, None, :]
        rpg = R // gpk
        for a in range(pf):
            wa = ((u >> jnp.uint32(bits * a)) & mask).astype(jnp.int32).astype(
                jnp.bfloat16
            )
            wa = ((wa.reshape(gpk, rpg, nt) - z) * s).reshape(R, nt)
            acc += jnp.dot(
                x[:, a * R : (a + 1) * R], wa, preferred_element_type=jnp.float32
            )
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _qmm_rt_kernel(
    x_ref, qw_ref, s_ref, zb_ref, o_ref, acc_ref, *, bits, kt, nt, gpk
):
    """Group-aligned rt-layout kernel: per-weight VPU work is ONLY the 3-op
    magic unpack. Each magic part covers whole groups (the repack guarantees
    it), so scales multiply per-group PARTIAL DOTS:
        y = Σ_g s_g ⊙ (x_g @ (codes_g + 128)) − Σ_g (Σx_g)(z_g+128)·s_g
    The zero/offset correction is computed IN-KERNEL from the exact same
    x_ref data the dots consume: computing it outside desyncs under
    --xla_allow_excess_precision (XLA elides the f32->bf16->f32 rounding of
    the activations, observed on-chip as a 3.6e-2 error), and both terms are
    large so any x mismatch leaks the +128 offset.

    8-bit variant (f32 magic 0x4B000000): codes don't fit the bf16 +128
    window, so each field becomes f32 ``2^23 + code`` via one OR + bitcast;
    subtracting 2^23 in f32 is exact and the result (<= 255) casts to bf16
    exactly — no int->float converts, and the offset cancels BEFORE the dot
    so ``zs`` carries no magic term. Extraction order is plane-major
    (no halving bitcast), see pack.rt_row_permutation."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pf = 32 // bits
    R = kt // pf
    g = kt // gpk
    u = qw_ref[:].astype(jnp.uint32)
    x = x_ref[:].astype(jnp.bfloat16)
    # bf16 operand blocks (zeros <= 255 and pow2 scales are bf16-exact;
    # zs math stays f32 in-kernel): f32 input blocks measured a lane-
    # handling penalty far beyond their bytes on the plane-split variant
    # (423 -> 542+ GB/s, session ASYM-RT-bf16)
    sf = s_ref[:].astype(jnp.float32)  # [gpk, nt] from bf16

    acc = acc_ref[:]
    if bits == 8:
        gpp = R // g  # whole groups per plane
        zs = zb_ref[:].astype(jnp.float32) * sf  # offset cancels pre-dot
        for a in range(pf):
            t = ((u >> jnp.uint32(8 * a)) & jnp.uint32(0xFF)) | jnp.uint32(
                0x4B000000
            )
            wf = pltpu.bitcast(t.astype(jnp.int32), jnp.float32) - jnp.float32(
                8388608.0
            )  # exact integer codes 0..255
            wa = wf.astype(jnp.bfloat16)  # exact (<= 255)
            for gi in range(gpp):
                g_abs = a * gpp + gi
                xg = x[:, g_abs * g : (g_abs + 1) * g]
                P = jnp.dot(
                    xg, wa[gi * g : (gi + 1) * g],
                    preferred_element_type=jnp.float32,
                )
                X1g = jnp.sum(xg.astype(jnp.float32), axis=1)
                acc += P * sf[g_abs][None, :] - X1g[:, None] * zs[g_abs][None, :]
        acc_ref[:] = acc
    else:
        gpp = (2 * R) // g  # whole groups per magic part
        fmask, magic = _MAGIC_BF16[bits]
        zs = (zb_ref[:].astype(jnp.float32) + _MAGIC_OFFSET) * sf
        for a in range(pf // 2):
            t = ((u >> jnp.uint32(bits * a)) & jnp.uint32(fmask)) | jnp.uint32(magic)
            wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16)  # [2R, nt]
            for gi in range(gpp):
                g_abs = a * gpp + gi
                xg = x[:, g_abs * g : (g_abs + 1) * g]  # lane-aligned (g % 128 == 0)
                P = jnp.dot(
                    xg, wa[gi * g : (gi + 1) * g], preferred_element_type=jnp.float32
                )
                X1g = jnp.sum(xg.astype(jnp.float32), axis=1)  # [bm]
                acc += P * sf[g_abs][None, :] - X1g[:, None] * zs[g_abs][None, :]
        acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _qmm_rt_sym_kernel(
    x_ref, qw_ref, s_ref, o_ref, acc_ref, *, bits, kt, nt, gpk, zero_const
):
    """rt kernel for UNIFORM zero points (sym quant): the zvals input
    disappears entirely (zs = const·s computed in-kernel) and scales ride as
    bf16 — cuts the non-code HBM bytes from 12.5% of packed to ~3%
    ((G,N) f32 ×2 -> (G,N) bf16 ×1). The bf16 scale rounding (~0.4% rel) is
    the same order as the bf16 dequant the convert path already does."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pf = 32 // bits
    R = kt // pf
    g = kt // gpk
    u = qw_ref[:].astype(jnp.uint32)
    x = x_ref[:].astype(jnp.bfloat16)
    sf = s_ref[:].astype(jnp.float32)  # [gpk, nt] from bf16

    acc = acc_ref[:]
    if bits == 8:
        gpp = R // g
        zs = jnp.float32(zero_const) * sf
        for a in range(pf):
            t = ((u >> jnp.uint32(8 * a)) & jnp.uint32(0xFF)) | jnp.uint32(
                0x4B000000
            )
            wf = pltpu.bitcast(t.astype(jnp.int32), jnp.float32) - jnp.float32(
                8388608.0
            )
            wa = wf.astype(jnp.bfloat16)
            for gi in range(gpp):
                g_abs = a * gpp + gi
                xg = x[:, g_abs * g : (g_abs + 1) * g]
                P = jnp.dot(
                    xg, wa[gi * g : (gi + 1) * g],
                    preferred_element_type=jnp.float32,
                )
                X1g = jnp.sum(xg.astype(jnp.float32), axis=1)
                acc += P * sf[g_abs][None, :] - X1g[:, None] * zs[g_abs][None, :]
    else:
        gpp = (2 * R) // g
        fmask, magic = _MAGIC_BF16[bits]
        zs = jnp.float32(zero_const + _MAGIC_OFFSET) * sf
        for a in range(pf // 2):
            t = ((u >> jnp.uint32(bits * a)) & jnp.uint32(fmask)) | jnp.uint32(magic)
            wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16)
            for gi in range(gpp):
                g_abs = a * gpp + gi
                xg = x[:, g_abs * g : (g_abs + 1) * g]
                P = jnp.dot(
                    xg, wa[gi * g : (gi + 1) * g], preferred_element_type=jnp.float32
                )
                X1g = jnp.sum(xg.astype(jnp.float32), axis=1)
                acc += P * sf[g_abs][None, :] - X1g[:, None] * zs[g_abs][None, :]
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _qmm_rt_sym_fused_kernel(
    x_ref, qw_ref, s_ref, o_ref, acc_ref, *, bits, kt, nt, gpk, zero_const
):
    """Fused-dequant variant of the sym rt kernel: scales fold into the bf16
    weight tile (offset subtracted exactly in the bf16 integer domain first),
    giving ONE large MXU dot per unpack plane plus a single rank-``gpk``
    zero-point correction matmul per K-tile — instead of a dot + f32 acc
    update per group. Cuts VPU traffic on the [bm, nt] accumulator by
    ~gpk/(pf/2+1)x. Precision matches the marlin/exllama CUDA kernels
    (fp16-domain dequant before the GEMM, gptqmodel_ext/marlin): code*scale
    rounds to bf16 (2^-8 rel), vs the per-group path's f32 P*scale."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pf = 32 // bits
    R = kt // pf
    g = kt // gpk
    u = qw_ref[:].astype(jnp.uint32)
    x = x_ref[:].astype(jnp.bfloat16)
    sfb = s_ref[:]  # [gpk, nt] bf16
    bm = x.shape[0]

    def scaled_tile(wa, a, gpp):
        # per-group row-scale via static sublane slices + lane broadcast
        # (3D reshape/broadcast forms lower to Mosaic gathers — avoid)
        return jnp.concatenate(
            [
                wa[gi * g : (gi + 1) * g, :] * sfb[a * gpp + gi, :][None, :]
                for gi in range(gpp)
            ],
            axis=0,
        )

    acc = acc_ref[:]
    if bits == 8:
        gpp = R // g
        for a in range(pf):
            t = ((u >> jnp.uint32(8 * a)) & jnp.uint32(0xFF)) | jnp.uint32(
                0x4B000000
            )
            wf = pltpu.bitcast(t.astype(jnp.int32), jnp.float32) - jnp.float32(
                8388608.0
            )
            wa = wf.astype(jnp.bfloat16)  # codes 0..255, exact in bf16
            acc += jnp.dot(
                x[:, a * gpp * g : (a + 1) * gpp * g], scaled_tile(wa, a, gpp),
                preferred_element_type=jnp.float32,
            )
    else:
        gpp = (2 * R) // g
        fmask, magic = _MAGIC_BF16[bits]
        off = jnp.bfloat16(_MAGIC_OFFSET)
        for a in range(pf // 2):
            t = ((u >> jnp.uint32(bits * a)) & jnp.uint32(fmask)) | jnp.uint32(magic)
            # (128 + code) - 128 == code, exact (both <= 2^8 in bf16)
            wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16) - off
            acc += jnp.dot(
                x[:, a * gpp * g : (a + 1) * gpp * g], scaled_tile(wa, a, gpp),
                preferred_element_type=jnp.float32,
            )
    # single zero-point correction for the whole K-tile: acc -= X1 @ (z*s)
    xf = x.astype(jnp.float32)
    X1 = jnp.concatenate(
        [
            jnp.sum(xf[:, gi * g : (gi + 1) * g], axis=1, keepdims=True)
            for gi in range(gpk)
        ],
        axis=1,
    )
    zs = jnp.float32(zero_const) * sfb.astype(jnp.float32)
    acc -= jnp.dot(X1, zs, preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _rtp_accumulate(x, qw_ref, sf, zs, acc, *, kt, gpk, planes):
    """Shared plane-split accumulation (see _qmm_rtp_sym_kernel doc):
    per-plane magic extraction + group-aligned partial dots; ``zs``
    ([gpk, nt] f32, zero+magic-offset times scale) folds into the first
    (widest) plane, whose parts cover whole groups."""
    g = kt // gpk
    r0 = 0
    first = True
    for w, off in planes:
        Rw = kt * w // 32
        u = qw_ref[r0 : r0 + Rw, :].astype(jnp.uint32)
        r0 += Rw
        pf = 32 // w
        part = kt * w // 16  # rows per paired magic extraction
        fmask = jnp.uint32(((1 << w) - 1) * 0x00010001)
        sfm = sf * jnp.float32(1 << off) if off else sf
        for a in range(pf // 2):
            t = ((u >> jnp.uint32(w * a)) & fmask) | jnp.uint32(0x43004300)
            wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16)  # p + 128
            offr = a * part
            s0 = 0
            while s0 < part:  # group-aligned subslices (static unroll)
                gi = (offr + s0) // g
                ln = min((gi + 1) * g - (offr + s0), part - s0)
                xg = x[:, offr + s0 : offr + s0 + ln]
                P = jnp.dot(
                    xg, wa[s0 : s0 + ln], preferred_element_type=jnp.float32
                )
                acc += P * sfm[gi][None, :]
                if first:
                    # widest plane first: its parts are whole groups, so
                    # the per-group zero/offset correction folds in here
                    assert ln == g, (ln, g, "first plane must cover groups")
                    X1g = jnp.sum(xg.astype(jnp.float32), axis=1)
                    acc -= X1g[:, None] * zs[gi][None, :]
                s0 += ln
        first = False
    return acc


def _qmm_rtp_sym_kernel(
    x_ref, qw_ref, s_ref, o_ref, acc_ref, *, kt, nt, gpk, zero_const, planes
):
    """Plane-split rt kernel (sym) for non-power-of-two bits: the qweight
    block holds one rt-permuted sub-array per bit plane (pack._PLANAR_PLANES
    decomposition — 3 = 2+1, 5 = 4+1, 6 = 4+2, 7 = 4+2+1; streams EXACTLY
    ``bits``/weight). Codes recombine via DISTRIBUTED per-plane partial
    dots — y = Σ_planes 2^off Σ_g s_g (x_g @ (plane_g + 128))
            − Σ_g X1_g (z + 128·Σ 2^off) s_g —
    a combined-tile variant (sublane concat + fma) measured 4× slower on
    chip (session: 3-bit rt). First-plane parts cover whole groups (16-group
    tiles enforced), later planes' parts subdivide groups but never cross a
    boundary. Reference 3/5/6/7-bit lineage: exllama q3 shift tables and
    the gptq_p planar dequant zoo — here the layout dissolves at repack
    time and one kernel serves every width."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)
    sf = s_ref[:].astype(jnp.float32)  # [gpk, nt] from bf16

    mult_sum = sum(1 << off for _, off in planes)
    zs = jnp.float32(zero_const + mult_sum * _MAGIC_OFFSET) * sf
    acc_ref[:] = _rtp_accumulate(
        x, qw_ref, sf, zs, acc_ref[:], kt=kt, gpk=gpk, planes=planes
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _qmm_rtp_kernel(
    x_ref, qw_ref, s_ref, zb_ref, o_ref, acc_ref, *, kt, nt, gpk, planes
):
    """Asym plane-split rt kernel: per-group zero points ride as a
    [gpk, nt] f32 zvals block (raw zeros; the 128·Σ2^off magic offset is
    added in-kernel), everything else identical to _qmm_rtp_sym_kernel.
    The reference has NO asym fast kernel at these widths (Marlin is
    sym-only, nn_modules/qlinear/marlin.py:56-74); session Z14 measured
    the XLA fallback at 9-16 GB/s vs the rt kernels' 528-743 — this
    variant closes that 52x gap for asym 3/5/6/7-bit checkpoints."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)
    # bf16 inputs (like the sym kernel's scales): zeros <= 127 are bf16-
    # exact and scale rounding (~0.4% rel) matches the dequant path's own
    # bf16 precision — halves the non-code HBM bytes (17% of packed at
    # 3-bit in f32)
    sf = s_ref[:].astype(jnp.float32)  # [gpk, nt] from bf16
    mult_sum = sum(1 << off for _, off in planes)
    zs = (zb_ref[:].astype(jnp.float32)
          + jnp.float32(mult_sum * _MAGIC_OFFSET)) * sf
    acc_ref[:] = _rtp_accumulate(
        x, qw_ref, sf, zs, acc_ref[:], kt=kt, gpk=gpk, planes=planes
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def rt_supported(bits: int, group_size: int, K: int) -> bool:
    """rt layout contract: magic bits (bf16 for 2/4, f32 for 8, plane-split
    for 3 — sym only, enforced at post_init), 128-lane-aligned groups,
    tiles of >= 8 groups (Mosaic sublane rule for the scales block). For
    8-bit each plane (K-tile/4 rows) must cover whole groups: 8 groups/tile
    gives 2 per plane."""
    if bits not in (2, 3, 4, 5, 6, 7, 8):
        return False
    g = group_size if group_size > 0 else K
    if bits in (3, 5, 6, 7):
        # plane-split layout: 1-bit parts span kt/16 rows; 16-group tiles
        # keep every x lane slice 128-aligned (kt/16 = g) — 8-group tiles
        # would slice at g/2
        return g % 128 == 0 and K % (16 * g) == 0
    return g % 128 == 0 and K % (8 * g) == 0


def _shape_map_lookup(env: str, K: int, N: int) -> int:
    """Per-shape tuning override: env holds ``KxN=v,...`` (or ``N=v`` to match
    any K). Returns 0 when no entry matches — callers fall through to their
    default. Lets one process A/B per-projection configs end-to-end."""
    import os

    raw = os.environ.get(env, "")
    if not raw:
        return 0
    for entry in raw.split(","):
        if "=" not in entry:
            continue
        key, val = entry.split("=")
        if "x" in key:
            kk, nn = key.split("x")
            if int(kk) == K and int(nn) == N:
                return int(val)
        elif int(key) == N:
            return int(val)
    return 0


def rt_block_k_for(
    K: int, group_size: int, groups_per_tile: int = 0, N: int = 0,
    bits: int = 0,
) -> int:
    """Repack/kernel K-tile: ``groups_per_tile`` groups (>= 8 for the Mosaic
    sublane rule on the scales block). Bigger tiles cut grid/DMA overhead —
    0 resolves per-shape GPTQ_TPU_GROUPS_MAP, then GPTQ_TPU_RT_GROUPS (16)."""
    import os

    g = group_size if group_size > 0 else K
    # default 16 groups/tile: measured +12% kernel throughput over 8 on v5e
    # (fewer grid blocks / DMA descriptors); falls back by halving when the
    # tile doesn't divide K
    gpt = (
        groups_per_tile
        or (_shape_map_lookup("GPTQ_TPU_GROUPS_MAP", K, N) if N else 0)
        or int(os.environ.get("GPTQ_TPU_RT_GROUPS", "16"))
    )
    floor = 16 if bits in (3, 5, 6, 7) else 8  # plane-split: 16-group tiles
    gpt = max(floor, gpt)
    while gpt > floor and (K % (gpt * g) != 0):
        gpt //= 2
    gpt = max(floor, gpt)
    if K % (gpt * g) != 0:
        gpt = floor
    return gpt * g


def _plane_permute_x(x: jnp.ndarray, kt: int, pf: int, bits: int) -> jnp.ndarray:
    """Permute the K axis of x to match the kernel's per-tile unpack order.

    Magic path (2/4-bit): iteration a emits rows ``2r+h`` = logical
    ``r*pf + a + (pf/2)*h`` -> order (a, r, h).
    Convert path (8-bit): plane-major ``(a, r)`` -> logical ``r*pf + a``.
    """
    M, K = x.shape
    R = kt // pf
    if bits in _MAGIC_BF16:
        xp = x.reshape(M, K // kt, R, 2, pf // 2)  # dims (r, h, a)
        xp = xp.transpose(0, 1, 4, 2, 3)  # -> (a, r, h)
        return xp.reshape(M, K)
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
    static_argnames=(
        "bits", "group_size", "block_m", "block_n", "block_k", "rt",
        "rt_block_k", "zero_const", "interpret",
    ),
)
def qmatmul(
    x: jnp.ndarray,  # [M, K] (bf16/f32)
    qweight: jnp.ndarray,  # [K/pf, N] int32 (GPTQ interchange layout)
    scales: jnp.ndarray,  # [G, N]
    zvals: jnp.ndarray,  # [G, N] f32 raw zero points
    *,
    bits: int,
    group_size: int,
    block_m: int = 0,
    block_n: int = 0,
    block_k: int = 0,
    rt: bool = False,
    rt_block_k: int = 0,
    zero_const: float = -1.0,  # >= 0: uniform zero point (sym) — zvals-free
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused dequant-matmul ``y = x @ dequant(qweight)`` for contiguous
    groups. ``rt=True`` expects the group-aligned repacked layout
    (pack.repack_rt with the SAME tile: pass the module's rt_block_k)."""
    M, K = x.shape
    pf = 32 // bits
    N = qweight.shape[1]
    G = scales.shape[0]
    g = group_size if group_size > 0 else K
    if bits in (3, 5, 6, 7):  # plane-split rt layout: no integral pf
        assert rt, "3/5/6/7-bit fast path is rt only"
        assert qweight.shape[0] * 32 == bits * K, (qweight.shape, K, bits)
        gp_ = group_size if group_size > 0 else K
        bkp = rt_block_k or rt_block_k_for(K, group_size)
        assert bkp % (16 * gp_) == 0, (bkp, gp_, "plane rt needs 16-group tiles")
    else:
        assert qweight.shape[0] * pf == K, (qweight.shape, K, bits)
    assert G * g == K, (G, g, K)

    bk = (
        (rt_block_k or rt_block_k_for(K, group_size))
        if rt
        else _pick_block_k(K, g, block_k)
    )
    bm = block_m or (8 if M <= 8 else (128 if M >= 128 else _round_up(M, 8)))
    # decode (small M): wide N tiles amortize per-block overheads (measured
    # on v5e: bn=1024 beats 256 by ~20% at M<=8; 2048 ~3% over 1024 on the
    # down-proj shape); env override for experiments
    import os

    # decode default 2048: consistently +1-5pp roofline over 1024 in paired
    # interleaved A/B on v5e (chip-state drift between runs is larger than
    # the effect, so always compare configs back-to-back). Per-shape override
    # GPTQ_TPU_BN_MAP ("KxN=bn" / "N=bn") beats the flat GPTQ_TPU_BN.
    bn_default = (
        _shape_map_lookup("GPTQ_TPU_BN_MAP", K, N)
        or int(os.environ.get("GPTQ_TPU_BN", "0"))
        or (2048 if M <= 16 else 512)
    )
    bn = min(block_n or bn_default, N)
    gpk = bk // g

    grid = (_cdiv(N, bn), _cdiv(M, bm), _cdiv(K, bk))
    common = dict(
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
    )
    x_spec = pl.BlockSpec((bm, bk), lambda n, m, k: (m, k), memory_space=pltpu.VMEM)
    qw_rows = bits * bk // 32 if bits in (3, 5, 6, 7) else bk // pf
    qw_spec = pl.BlockSpec(
        (qw_rows, bn), lambda n, m, k: (k, n), memory_space=pltpu.VMEM
    )
    sz_spec = pl.BlockSpec((gpk, bn), lambda n, m, k: (k, n), memory_space=pltpu.VMEM)

    if rt:
        assert rt_supported(bits, group_size, K), (bits, group_size, K)
        if bits in (3, 5, 6, 7):  # plane-split kernels
            from gptqmodel_tpu.ops.pack import _PLANAR_PLANES

            if zero_const >= 0.0:  # sym: zvals-free, bf16 scales
                kernel = functools.partial(
                    _qmm_rtp_sym_kernel, kt=bk, nt=bn, gpk=gpk,
                    zero_const=float(zero_const),
                    planes=tuple(_PLANAR_PLANES[bits]),
                )
                return pl.pallas_call(
                    kernel,
                    grid=grid,
                    in_specs=[x_spec, qw_spec, sz_spec],
                    **common,
                )(x, qweight, scales.astype(jnp.bfloat16))
            kernel = functools.partial(
                _qmm_rtp_kernel, kt=bk, nt=bn, gpk=gpk,
                planes=tuple(_PLANAR_PLANES[bits]),
            )
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[x_spec, qw_spec, sz_spec, sz_spec],
                **common,
            )(x, qweight, scales.astype(jnp.bfloat16),
              zvals.astype(jnp.bfloat16))
        if zero_const >= 0.0:  # sym fast path: no zvals input, bf16 scales
            sym_impl = (
                _qmm_rt_sym_fused_kernel
                if os.environ.get("GPTQ_TPU_RT_FUSED", "0") == "1"
                else _qmm_rt_sym_kernel
            )
            kernel = functools.partial(
                sym_impl, bits=bits, kt=bk, nt=bn, gpk=gpk,
                zero_const=float(zero_const),
            )
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[x_spec, qw_spec, sz_spec],
                **common,
            )(x, qweight, scales.astype(jnp.bfloat16))
        kernel = functools.partial(
            _qmm_rt_kernel, bits=bits, kt=bk, nt=bn, gpk=gpk
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[x_spec, qw_spec, sz_spec, sz_spec],
            **common,
        )(x, qweight, scales.astype(jnp.bfloat16),
          zvals.astype(jnp.bfloat16))

    xp = _plane_permute_x(x, bk, pf, bits)
    kernel = functools.partial(_qmm_kernel, bits=bits, kt=bk, nt=bn, gpk=gpk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec, qw_spec, sz_spec, sz_spec],
        **common,
    )(xp, qweight, scales.astype(jnp.float32), zvals.astype(jnp.float32))
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
