"""Pallas quantized ragged-MoE dispatch (packed grouped-GEMM).

The dense MoE formulation streams EVERY expert's weights each step; the
bf16 ``jax.lax.ragged_dot`` path (optimize.stack_moe_experts) fixes the
compute waste but requires dequantized (bf16) experts — forfeiting the 4x
HBM saving exactly where it matters most (decode is weight-bound). This
kernel is the packed analog of a grouped GEMM (megablocks / vLLM fused-MoE
regime, which the reference delegates to vLLM — SURVEY §2.9):

* tokens are sorted by expert (same host-side prep as the bf16 ragged path)
  and decomposed into SLOTS of <= ``bm`` rows, each owned by one expert;
* the grid runs (n_blocks, slots) with the slot's expert id scalar-prefetched
  into the qweight/scales index_maps — only ROUTED experts' packed weights
  are DMA'd, and consecutive slots of the same expert reuse the resident
  block (Mosaic skips the re-fetch when the mapped block is unchanged);
* in-kernel dequant is the same magic-bf16 / f32 arithmetic as
  pallas_qmatmul, on the INTERCHANGE layout with the activation K-axis
  pre-permuted (plane-major trick) — no per-expert repack needed, so any
  group count (e.g. moe_intermediate 1408 = 11 groups) works;
* rows are written through a dynamic-start slice with a tail mask, so slot
  boundaries inside an expert and expert boundaries across slots stay exact.

Sym (uniform zero point) checkpoints only — asym falls back to the dense
loop (reference MoE quantization is sym by default).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptqmodel_tpu.ops.pallas_qmatmul import _MAGIC_BF16, _MAGIC_OFFSET


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def build_slots(
    top_i: np.ndarray, E: int, bm: int, max_slots: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side slot plan from routed expert assignments (test oracle for
    :func:`plan_slots_jit`).

    ALIGNED layout: slot s owns rows [s*bm, s*bm + count_s) of the padded
    row buffer — every expert segment starts on a slot boundary so dynamic
    row slices in the kernel are statically bm-aligned (Mosaic sublane
    rule). Returns (pos, expert_ids[S], row_count[S], order): ``order``
    sorts the flattened (token, k) pairs by expert; sorted row r lands at
    padded position pos[r]. Padded slots repeat the last expert id with
    count 0 (no extra DMA, no writes).
    """
    flat = np.asarray(top_i).reshape(-1)
    order = np.argsort(flat, kind="stable")
    sorted_e = flat[order]
    ids, counts = [], []
    pos = np.zeros(flat.shape[0], np.int64)
    i = 0
    M = sorted_e.shape[0]
    while i < M:
        e = int(sorted_e[i])
        j = i
        while j < M and int(sorted_e[j]) == e:
            j += 1
        for s in range(i, j, bm):
            c = min(bm, j - s)
            pos[s : s + c] = len(ids) * bm + np.arange(c)
            ids.append(e)
            counts.append(c)
        i = j
    assert len(ids) <= max_slots, (len(ids), max_slots)
    pad_e = ids[-1] if ids else 0
    while len(ids) < max_slots:
        ids.append(pad_e)
        counts.append(0)
    return (
        pos,
        np.asarray(ids, np.int32),
        np.asarray(counts, np.int32),
        order,
    )


def _ic_contract(x, u, s_full, *, bits, G, zero_const):
    """Interchange-layout dequant-matmul: ``x [m, K]`` (K-axis PLANE-PERMUTED
    per :func:`pallas_qmatmul._plane_permute_x`) against packed ``u [K/pf,
    nt]`` with padded group scales ``s_full [G_pad, nt]`` and a SCALAR zero
    point. Exact copy of _qmm_kernel's plane math (pallas_qmatmul.py:54).
    Returns [m, nt] f32."""
    R, nt = u.shape
    kt = R * (32 // bits)
    m = x.shape[0]
    s = s_full[:G].astype(jnp.bfloat16)[:, None, :]  # [G, 1, nt]
    pf = 32 // bits
    acc = jnp.zeros((m, nt), jnp.float32)
    if bits == 8:
        z = jnp.bfloat16(zero_const)
        rpg = R // G
        for a in range(pf):
            wa = ((u >> jnp.uint32(8 * a)) & jnp.uint32(0xFF)).astype(
                jnp.int32
            ).astype(jnp.bfloat16)
            wa = ((wa.reshape(G, rpg, nt) - z) * s).reshape(R, nt)
            acc += jnp.dot(
                x[:, a * R : (a + 1) * R], wa,
                preferred_element_type=jnp.float32,
            )
    else:
        fmask, magic = _MAGIC_BF16[bits]
        zoff = jnp.bfloat16(zero_const + _MAGIC_OFFSET)
        rpg = (2 * R) // G
        for a in range(pf // 2):
            t = ((u >> jnp.uint32(bits * a)) & jnp.uint32(fmask)) | jnp.uint32(
                magic
            )
            wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16)  # [2R, nt]
            wa = ((wa.reshape(G, rpg, nt) - zoff) * s).reshape(2 * R, nt)
            acc += jnp.dot(
                x[:, a * 2 * R : (a + 1) * 2 * R], wa,
                preferred_element_type=jnp.float32,
            )
    return acc


def _rt_contract(x, u, s_full, *, bits, G, zero_const):
    """rt-layout dequant-matmul: ``x [m, K]`` in LOGICAL column order
    against per-expert rt-packed words ``u [K/pf, nt]`` (whole-K tile,
    pack.rt_row_permutation(block_k=K)). Magic part ``a`` extracts the
    contiguous logical rows [a*rpp, (a+1)*rpp) covering WHOLE groups, so
    scales apply to per-group partial dots (the _qmm_rt_sym_kernel
    formulation) — per-weight VPU work is only the 3-op magic build.
    Session Z11 measured the per-element (w-z)*s of the interchange
    ``_ic_contract`` as the e2e kernel's compute wall (7 us/slot with the
    DMA fully hidden under it); this removes it. Returns [m, nt] f32."""
    R, nt = u.shape
    pf = 32 // bits
    kt = R * pf
    m = x.shape[0]
    g = kt // G
    sf = s_full[:G].astype(jnp.float32)  # [G, nt]
    acc = jnp.zeros((m, nt), jnp.float32)
    if bits == 8:
        parts, rpp = pf, R
        zbase = jnp.float32(zero_const)
    else:
        parts, rpp = pf // 2, 2 * R
        zbase = jnp.float32(zero_const) + _MAGIC_OFFSET
        fmask, magic = _MAGIC_BF16[bits]
    zs = zbase * sf
    for a in range(parts):
        if bits == 8:
            t = ((u >> jnp.uint32(8 * a)) & jnp.uint32(0xFF)) | jnp.uint32(
                0x4B000000
            )
            wf = pltpu.bitcast(t.astype(jnp.int32), jnp.float32) - jnp.float32(
                8388608.0
            )
            wa = wf.astype(jnp.bfloat16)
        else:
            t = ((u >> jnp.uint32(bits * a)) & jnp.uint32(fmask)) | jnp.uint32(
                magic
            )
            wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16)  # [rpp, nt]
        # walk the part's contiguous logical range [a*rpp, (a+1)*rpp) in
        # group-aligned SEGMENTS: whole groups when rpp % g == 0 (gate|up),
        # sub-group cuts at gcd(rpp, g) lanes otherwise (down at K=768:
        # 128+64 per part) — each segment's scale is still a single s_g
        lo = a * rpp
        seg = lo
        while seg < lo + rpp:
            g_abs = seg // g
            seg_end = min((g_abs + 1) * g, lo + rpp)
            xg = x[:, seg:seg_end]
            P = jnp.dot(xg, wa[seg - lo:seg_end - lo],
                        preferred_element_type=jnp.float32)
            X1 = jnp.sum(xg.astype(jnp.float32), axis=1)
            acc += P * sf[g_abs][None, :] - X1[:, None] * zs[g_abs][None, :]
            seg = seg_end
    return acc


def stacked_rt_ok(bits: int, K: int, g: int, subgroup: bool = False) -> bool:
    """rt eligibility at block_k == K. ``subgroup=False``: whole groups per
    magic part and 128-aligned in-kernel x lane cuts (always safe).
    ``subgroup=True``: allows sub-group segments at gcd(rpp, g) lanes —
    64-lane static slices, used for the down projection (measured fine on
    v5e Mosaic, session Z13)."""
    if bits not in (2, 4, 8):
        return False
    pf = 32 // bits
    if K % pf:
        return False
    rpp = (K // pf) if bits == 8 else (2 * K // pf)
    if subgroup:
        cut = np.gcd(rpp, g)
        return g % 64 == 0 and cut % 64 == 0
    return g % 128 == 0 and rpp % g == 0


def _plane_perm_matrix(K: int, bits: int) -> np.ndarray:
    """0/1 matrix P [K, K] such that ``x @ P`` reorders columns of
    ``x [m, K]`` (logical order) into the plane extraction order consumed by
    :func:`_ic_contract` — the in-kernel analog of
    pallas_qmatmul._plane_permute_x with kt == K. A matmul instead of a
    reshape/transpose because Mosaic cannot relayout the 4-D shape cast
    in-kernel ("infer-vector-layout: unsupported shape cast"); the product
    is EXACT for bf16 inputs (one nonzero per column, f32 accumulate) and
    MXU-trivial at slot sizes."""
    from gptqmodel_tpu.ops.pallas_qmatmul import _plane_permute_x

    perm = np.asarray(
        _plane_permute_x(np.arange(K, dtype=np.float32)[None], K,
                         32 // bits, bits)
    )[0].astype(np.int64)  # position p holds logical column perm[p]
    return (np.arange(K)[:, None] == perm[None, :]).astype(np.float32)


def _qmoe_kernel(
    ids_ref, count_ref, x_ref, qw_ref, s_ref, o_ref,
    *, bits, kt, nt, G, bm, zero_const,
):
    """One (n-block, slot): dequant the slot's expert tile, matmul its <= bm
    rows, masked-accumulate into the output rows. Slot s owns rows
    [s*bm, s*bm + count) — the start is statically bm-aligned (Mosaic
    sublane rule for dynamic slices)."""
    s_idx = pl.program_id(1)

    @pl.when(s_idx == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    r0 = s_idx * bm
    cnt = count_ref[s_idx]

    @pl.when(cnt > 0)
    def _():
        u = qw_ref[0].astype(jnp.uint32)  # [R, nt]
        x = x_ref[pl.ds(r0, bm), :].astype(jnp.bfloat16)  # [bm, kt] permuted
        acc = _ic_contract(
            x, u, s_ref[0], bits=bits, G=G, zero_const=zero_const
        )
        rows = jax.lax.broadcasted_iota(jnp.int32, (bm, nt), 0)
        keep = rows < cnt
        o_ref[pl.ds(r0, bm), :] = jnp.where(keep, acc.astype(o_ref.dtype), 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "G", "bm", "zero_const", "interpret", "out_dtype"),
)
def qmoe_matmul(
    x_sorted: jnp.ndarray,  # [S*bm, K] bf16/f32, slot-aligned expert-sorted
    # rows, K-axis pre-permuted (pallas_qmatmul._plane_permute_x with kt=K)
    expert_ids: jnp.ndarray,  # [S] int32
    row_count: jnp.ndarray,  # [S] int32 (<= bm)
    qw_stacked: jnp.ndarray,  # [E, K/pf, N] int32 interchange layout
    s_stacked: jnp.ndarray,  # [E, G_pad, N] bf16 (zero-padded groups)
    *,
    bits: int,
    G: int,  # real group count (K // group_size)
    bm: int = 8,
    zero_const: float = 8.0,
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """y_sorted [M_pad, N] = per-slot x @ dequant(qw[expert]).

    ``out_dtype=bf16`` halves the slot-padded intermediate HBM traffic
    (decode MoE layers write/read [M_pad, N] three times per layer) — same
    precision class as the reference CUDA kernels' half outputs."""
    M_pad, K = x_sorted.shape
    E, Kpf, N = qw_stacked.shape
    S = expert_ids.shape[0]
    assert M_pad == S * bm, (M_pad, S, bm)
    G_pad = s_stacked.shape[1]
    if N % 512 == 0:
        nt = 512
    elif N % 256 == 0:
        nt = 256
    elif N % 128 == 0 and N > 2048:
        nt = 128
    else:
        nt = N  # odd widths (e.g. moe_intermediate 1408): one N block
    assert N % nt == 0, (N, nt)
    assert M_pad % bm == 0

    grid = (N // nt, S)
    kernel = functools.partial(
        _qmoe_kernel, bits=bits, kt=K, nt=nt, G=G, bm=bm,
        zero_const=zero_const,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (M_pad, K), lambda n, s, ids, ct: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Kpf, nt),
                    lambda n, s, ids, ct: (ids[s], 0, n),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, G_pad, nt),
                    lambda n, s, ids, ct: (ids[s], 0, n),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (M_pad, nt), lambda n, s, ids, ct: (0, n),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((M_pad, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(expert_ids, row_count, x_sorted, qw_stacked, s_stacked)


# --------------------------------------------------------------------------
# fused slot-MLP kernel: gate|up + act·mul + down in ONE launch
# --------------------------------------------------------------------------
#
# The 3-kernel ragged dispatch round-trips the slot-PADDED intermediates
# ([S*bm, 2F] gate|up out + [S*bm, F] inner + xs re-read) through HBM every
# layer — at decode shapes (B=8 top-8: 64 real rows padded to ~576) that is
# most of the ~10% traffic gap vs the dense kernel (BENCH_MOE_r02 / STATUS
# decomposition). Here each slot runs the whole expert MLP on VMEM-resident
# tiles: only xs is read and y written; gate/up/down packed weights stream
# exactly once per routed expert (consecutive same-expert slots reuse the
# resident blocks). The intermediate needs the down contraction's plane
# order — a static in-register transpose (_plane_permute_vals), no extra HBM
# bytes. Reference analog: fused-MoE grouped GEMM epilogues (vLLM
# fused_moe), done TPU-style as one Pallas program.


def _act_kernel(name: str):
    # "gelu" must be the EXACT erf form (jax.nn.gelu defaults to the tanh
    # approximation) — transformer._act's mapping, so the kernels match
    # their own XLA fallback bit-for-bit in structure
    return {
        "silu": jax.nn.silu,
        "gelu": lambda v: jax.nn.gelu(v, approximate=False),
        "gelu_pytorch_tanh": lambda v: jax.nn.gelu(v, approximate=True),
        "gelu_new": lambda v: jax.nn.gelu(v, approximate=True),
        "relu": lambda v: jnp.maximum(v, 0.0),
    }[name]


def _qmoe_mlp_kernel(
    ids_ref, count_ref, x_ref, qwgu_ref, sgu_ref, qwd_ref, sd_ref, perm_ref,
    o_ref, *, bits, F, G_gu, G_d, bm, zc, act,
):
    s_idx = pl.program_id(0)

    @pl.when(s_idx == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    r0 = s_idx * bm
    cnt = count_ref[s_idx]

    @pl.when(cnt > 0)
    def _():
        x = x_ref[pl.ds(r0, bm), :].astype(jnp.bfloat16)  # [bm, D] permuted
        both = _ic_contract(
            x, qwgu_ref[0].astype(jnp.uint32), sgu_ref[0],
            bits=bits, G=G_gu, zero_const=zc,
        )  # [bm, 2F] logical N order
        g, u = both[:, :F], both[:, F:]
        inner = (_act_kernel(act)(g) * u).astype(jnp.bfloat16)  # [bm, F]
        # reorder columns into down's extraction order via the 0/1 perm
        # matmul (exact; see _plane_perm_matrix)
        inner_p = jnp.dot(
            inner, perm_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        y = _ic_contract(
            inner_p, qwd_ref[0].astype(jnp.uint32), sd_ref[0],
            bits=bits, G=G_d, zero_const=zc,
        )  # [bm, D]
        D = y.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (bm, D), 0)
        o_ref[pl.ds(r0, bm), :] = jnp.where(
            rows < cnt, y.astype(o_ref.dtype), 0.0
        )


_QMOE_MLP_VMEM_BUDGET = 13 * 2**20


def qmoe_mlp_supported(
    *, bits, D, F, G_gu, G_d, M_pad, act,
    budget: int = _QMOE_MLP_VMEM_BUDGET,
) -> bool:
    """Eligibility + VMEM estimate for the fused slot-MLP kernel."""
    if bits not in (2, 4, 8):
        return False
    if act not in ("silu", "gelu", "gelu_pytorch_tanh", "gelu_new", "relu"):
        return False
    pf = 32 // bits
    if D % pf or F % pf or (2 * F) % 128 or D % 128:
        return False
    # _ic_contract's scale reshape needs whole groups per extraction part:
    # rows-per-part (2R magic / R convert) must divide evenly into G groups
    rows_gu = (2 * D // pf) if bits != 8 else (D // pf)
    rows_d = (2 * F // pf) if bits != 8 else (F // pf)
    if rows_gu % G_gu or rows_d % G_d:
        return False
    # live VMEM: double-buffered gu + down weight tiles, resident xs + o,
    # the wa dequant temporary of the wider (gu) contract, the f32
    # accumulators, + headroom folded into the budget constant
    gu_tile = (D // pf) * 2 * F * 4
    d_tile = (F // pf) * D * 4
    xs_o = M_pad * D * 2 * 2
    wa = rows_gu * 2 * F * 2
    accs = 8 * (2 * F + D) * 4
    perm_p = F * F * 2  # resident 0/1 plane-perm matrix (bf16)
    est = 2 * (gu_tile + d_tile) + xs_o + wa + accs + perm_p
    return est <= budget


@functools.partial(
    jax.jit,
    static_argnames=("bits", "G_gu", "G_d", "F", "bm", "zc", "act",
                     "interpret", "out_dtype"),
)
def qmoe_mlp_matmul(
    x_sorted_p: jnp.ndarray,  # [S*bm, D] bf16, slot-aligned, PLANE-PERMUTED
    expert_ids: jnp.ndarray,  # [S] int32
    row_count: jnp.ndarray,  # [S] int32
    qw_gu: jnp.ndarray,  # [E, D/pf, 2F] int32 interchange (gate cols first)
    s_gu: jnp.ndarray,  # [E, Gp, 2F] bf16
    qw_d: jnp.ndarray,  # [E, F/pf, D] int32 interchange
    s_d: jnp.ndarray,  # [E, Gp_d, D] bf16
    *,
    bits: int,
    G_gu: int,
    G_d: int,
    F: int,
    bm: int = 8,
    zc: float = 8.0,
    act: str = "silu",
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """y_sorted [M_pad, D]: whole expert MLP per slot, one kernel launch."""
    M_pad, D = x_sorted_p.shape
    E, Kpf, twoF = qw_gu.shape
    S = expert_ids.shape[0]
    assert twoF == 2 * F and M_pad == S * bm
    Gp, Gp_d = s_gu.shape[1], s_d.shape[1]
    kernel = functools.partial(
        _qmoe_mlp_kernel, bits=bits, F=F, G_gu=G_gu, G_d=G_d, bm=bm,
        zc=zc, act=act,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S,),
            in_specs=[
                pl.BlockSpec(
                    (M_pad, D), lambda s, ids, ct: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Kpf, twoF), lambda s, ids, ct: (ids[s], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Gp, twoF), lambda s, ids, ct: (ids[s], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, F // (32 // bits), D),
                    lambda s, ids, ct: (ids[s], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Gp_d, D), lambda s, ids, ct: (ids[s], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (F, F), lambda s, ids, ct: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (M_pad, D), lambda s, ids, ct: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((M_pad, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        expert_ids, row_count, x_sorted_p, qw_gu, s_gu, qw_d, s_d,
        jnp.asarray(_plane_perm_matrix(F, bits), jnp.bfloat16),
    )


# --------------------------------------------------------------------------
# dynamic-slot fused MLP: fori over the USED slot count, manual DMA
# --------------------------------------------------------------------------
#
# The grid formulation above runs every STATIC slot (S = worst-case bound);
# session Z measured ~2.5 us per EMPTY grid step on v5e (pl.when-guarded
# compute and revisit-skipped DMA notwithstanding) — ~99 us/layer at honest
# decode routing (13 used of 72). Here ONE kernel instance fori-loops over
# the runtime used-slot count with double-buffered expert-tile DMAs from
# HBM, so empty slots never execute and decode cost scales with the experts
# a step actually routes. This is the part of the reference's grouped-GEMM
# dispatch that CUDA gets from dynamic grids (vLLM fused-MoE launches only
# routed blocks); TPU grids are static, so the dynamism moves into the
# kernel. Used slots are a PREFIX of the plan (build_slots / plan_slots_jit
# both pad at the end), so the trip count is just sum(counts > 0).


def _qmoe_mlp_dyn_kernel(
    ids_ref, count_ref, nused_ref,  # scalar prefetch (SMEM)
    x_ref, qwgu_hbm, sgu_hbm, qwd_hbm, sd_hbm, perm_ref,  # inputs
    o_ref,  # output [M_pad, D] VMEM
    gu_buf, sgu_buf, d_buf, sd_buf, sems,  # scratch (double buffers)
    *, bits, F, G_gu, G_d, bm, zc, act,
):
    n = nused_ref[0]
    o_ref[:] = jnp.zeros_like(o_ref)

    def dmas(slot, s):
        e = ids_ref[s]
        return (
            pltpu.make_async_copy(qwgu_hbm.at[e], gu_buf.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(sgu_hbm.at[e], sgu_buf.at[slot],
                                  sems.at[slot, 1]),
            pltpu.make_async_copy(qwd_hbm.at[e], d_buf.at[slot],
                                  sems.at[slot, 2]),
            pltpu.make_async_copy(sd_hbm.at[e], sd_buf.at[slot],
                                  sems.at[slot, 3]),
        )

    @pl.when(n > 0)
    def _():
        for d in dmas(0, 0):
            d.start()

        def body(i, carry):
            cur = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n)
            def _():
                for d in dmas(jax.lax.rem(i + 1, 2), i + 1):
                    d.start()

            for d in dmas(cur, i):
                d.wait()

            r0 = i * bm
            cnt = count_ref[i]
            x = x_ref[pl.ds(r0, bm), :].astype(jnp.bfloat16)
            both = _ic_contract(
                x, gu_buf[cur].astype(jnp.uint32), sgu_buf[cur],
                bits=bits, G=G_gu, zero_const=zc,
            )  # [bm, 2F] logical N order
            g, u = both[:, :F], both[:, F:]
            inner = (_act_kernel(act)(g) * u).astype(jnp.bfloat16)
            inner_p = jnp.dot(
                inner, perm_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            y = _ic_contract(
                inner_p, d_buf[cur].astype(jnp.uint32), sd_buf[cur],
                bits=bits, G=G_d, zero_const=zc,
            )  # [bm, D]
            D = y.shape[1]
            rows = jax.lax.broadcasted_iota(jnp.int32, (bm, D), 0)
            o_ref[pl.ds(r0, bm), :] = jnp.where(
                rows < cnt, y.astype(o_ref.dtype), 0.0
            )
            return carry

        jax.lax.fori_loop(0, n, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "G_gu", "G_d", "F", "bm", "zc", "act",
                     "interpret", "out_dtype"),
)
def qmoe_mlp_matmul_dyn(
    x_sorted_p: jnp.ndarray,  # [S*bm, D] bf16, slot-aligned, PLANE-PERMUTED
    expert_ids: jnp.ndarray,  # [S] int32
    row_count: jnp.ndarray,  # [S] int32 (used slots form a prefix)
    n_used: jnp.ndarray,  # [1] int32 = sum(row_count > 0)
    qw_gu: jnp.ndarray,  # [E, D/pf, 2F] int32 interchange (gate cols first)
    s_gu: jnp.ndarray,  # [E, Gp, 2F] bf16
    qw_d: jnp.ndarray,  # [E, F/pf, D] int32 interchange
    s_d: jnp.ndarray,  # [E, Gp_d, D] bf16
    *,
    bits: int,
    G_gu: int,
    G_d: int,
    F: int,
    bm: int = 8,
    zc: float = 8.0,
    act: str = "silu",
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """y_sorted [M_pad, D]: whole expert MLP per USED slot, one instance."""
    M_pad, D = x_sorted_p.shape
    E, Kpf, twoF = qw_gu.shape
    S = expert_ids.shape[0]
    assert twoF == 2 * F and M_pad == S * bm
    Gp, Gp_d = s_gu.shape[1], s_d.shape[1]
    Fpf = F // (32 // bits)
    kernel = functools.partial(
        _qmoe_mlp_dyn_kernel, bits=bits, F=F, G_gu=G_gu, G_d=G_d, bm=bm,
        zc=zc, act=act,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(),
            in_specs=[vmem, any_spec, any_spec, any_spec, any_spec, vmem],
            out_specs=vmem,
            scratch_shapes=[
                pltpu.VMEM((2, Kpf, twoF), qw_gu.dtype),
                pltpu.VMEM((2, Gp, twoF), s_gu.dtype),
                pltpu.VMEM((2, Fpf, D), qw_d.dtype),
                pltpu.VMEM((2, Gp_d, D), s_d.dtype),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((M_pad, D), out_dtype),
        interpret=interpret,
    )(
        expert_ids, row_count, n_used,
        x_sorted_p, qw_gu, s_gu, qw_d, s_d,
        jnp.asarray(_plane_perm_matrix(F, bits), jnp.bfloat16),
    )


# --------------------------------------------------------------------------
# end-to-end MoE layer kernel: gather + expert MLP + weighted combine
# --------------------------------------------------------------------------
#
# The dispatch around the slot kernels still costs real decode time: the
# [S*bm, D] slot buffer is scattered to HBM, read by the kernel, the [S*bm,
# D] result written back, gathered, weighted and scatter-added — ~10 MB of
# HBM round-trips plus several small XLA launches per layer. Here the slot
# buffers never exist: tokens stay resident as [N8, D] VMEM, each slot's
# rows are selected by an exact 0/1 one-hot matmul (MXU-trivial), and the
# routed output is weighted and accumulated into the [N8, D] result inside
# the same dynamic-trip slot loop. One kernel instance per MoE layer.
# Reference analog: the fused epilogues of CUDA grouped-GEMM MoE kernels
# (vLLM fused_moe writes weighted outputs in-kernel) — done TPU-style.


def _qmoe_mlp_e2e_kernel(
    ids_ref, nused_ref,  # scalar prefetch (SMEM)
    x_ref, tok_ref, w_ref, qwgu_hbm, sgu_hbm, qwd_hbm, sd_hbm,
    perm_ref,  # inputs
    o_ref,  # output [N8, D] f32 VMEM (accumulated)
    gu_buf, sgu_buf, d_buf, sd_buf, sems,  # scratch (NBUF-deep buffers)
    *, bits, F, G_gu, G_d, bm, zc, act, nbuf, unroll=1, rt_gu=False,
    rt_d=False,
):
    n = nused_ref[0]  # caller pads to a multiple of ``unroll`` (w=0 slots)
    N8 = o_ref.shape[0]
    U = unroll
    assert nbuf >= 2 * U, (nbuf, U)
    o_ref[:] = jnp.zeros_like(o_ref)

    def dmas(slot, s):
        e = ids_ref[s]
        return (
            pltpu.make_async_copy(qwgu_hbm.at[e], gu_buf.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(sgu_hbm.at[e], sgu_buf.at[slot],
                                  sems.at[slot, 1]),
            pltpu.make_async_copy(qwd_hbm.at[e], d_buf.at[slot],
                                  sems.at[slot, 2]),
            pltpu.make_async_copy(sd_hbm.at[e], sd_buf.at[slot],
                                  sems.at[slot, 3]),
        )

    @pl.when(n > 0)
    def _():
        # prefetch the first nbuf-U slots; each group then starts U more
        for j in range(nbuf - U):
            @pl.when(j < n)
            def _(j=j):
                for d in dmas(j, j):
                    d.start()

        def body(g, carry):
            # At decode-iid routing (~52 routed experts, ~1.25 rows each)
            # the per-slot cost is the SERIAL latency of the slot's 6-op
            # dependency chain (~4 us) while its DMA is only ~3.4 us —
            # round-3's session-Z "~4 us x used slots" term. Unrolling U
            # independent slot chains per trip lets Mosaic's in-order
            # scheduler interleave them, and the gather/combine dots batch
            # U slots into one MXU op each (round-4, VERDICT #2).
            base = g * U
            for j in range(U):
                s2 = base + (nbuf - U) + j

                @pl.when(s2 < n)
                def _(s2=s2):
                    for d in dmas(jax.lax.rem(s2, nbuf), s2):
                        d.start()

            for j in range(U):
                s = base + j
                for d in dmas(jax.lax.rem(s, nbuf), s):
                    d.wait()

            r0 = base * bm
            tokr = tok_ref[pl.ds(r0, U * bm), :]  # [U*bm, 1] (-1 = padding)
            cols = jax.lax.broadcasted_iota(jnp.int32, (U * bm, N8), 1)
            sel = (cols == tokr).astype(jnp.bfloat16)  # exact 0/1 row select
            x = jnp.dot(
                sel, x_ref[:], preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)  # [U*bm, D] permuted token rows
            ys = []
            for j in range(U):
                cur = jax.lax.rem(base + j, nbuf)
                xj = x[j * bm:(j + 1) * bm] if U > 1 else x
                gu_fn = _rt_contract if rt_gu else _ic_contract
                both = gu_fn(
                    xj, gu_buf[cur].astype(jnp.uint32), sgu_buf[cur],
                    bits=bits, G=G_gu, zero_const=zc,
                )  # [bm, 2F] logical N order
                gg, u = both[:, :F], both[:, F:]
                inner = (_act_kernel(act)(gg) * u).astype(jnp.bfloat16)
                if rt_d:  # rt down consumes logical inner: no perm dot
                    ys.append(_rt_contract(
                        inner, d_buf[cur].astype(jnp.uint32), sd_buf[cur],
                        bits=bits, G=G_d, zero_const=zc,
                    ))  # [bm, D] f32
                else:
                    inner_p = jnp.dot(
                        inner, perm_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)
                    ys.append(_ic_contract(
                        inner_p, d_buf[cur].astype(jnp.uint32), sd_buf[cur],
                        bits=bits, G=G_d, zero_const=zc,
                    ))  # [bm, D] f32
            y = ys[0] if U == 1 else jnp.concatenate(ys, axis=0)
            wr = w_ref[pl.ds(r0, U * bm), :]  # [U*bm, 1] f32 (0 for padding)
            # sel^T . (y*w) via dot_general contracting dim 0 of both — the
            # lane-major tok slice a transpose would need is not Mosaic-
            # addressable (dynamic lane start must be 128-aligned)
            o_ref[:] += jax.lax.dot_general(
                sel.astype(jnp.float32), y * wr,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return carry

        jax.lax.fori_loop(0, jax.lax.div(n + U - 1, U), body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "G_gu", "G_d", "F", "bm", "zc", "act",
                     "interpret", "nbuf", "unroll", "rt_gu", "rt_d"),
)
def qmoe_mlp_e2e(
    xp: jnp.ndarray,  # [N8, D] bf16 token rows, PLANE-PERMUTED (gu order)
    expert_ids: jnp.ndarray,  # [S] int32
    n_used: jnp.ndarray,  # [1] int32 = number of used slots (plan prefix)
    tok_col: jnp.ndarray,  # [S*bm, 1] int32: token index per slot row, -1 pad
    w_col: jnp.ndarray,  # [S*bm, 1] f32: routing weight per slot row, 0 pad
    qw_gu: jnp.ndarray,  # [E, D/pf, 2F] int32 interchange (gate cols first)
    s_gu: jnp.ndarray,  # [E, Gp, 2F] bf16
    qw_d: jnp.ndarray,  # [E, F/pf, D] int32 interchange
    s_d: jnp.ndarray,  # [E, Gp_d, D] bf16
    *,
    bits: int,
    G_gu: int,
    G_d: int,
    F: int,
    bm: int = 8,
    zc: float = 8.0,
    act: str = "silu",
    interpret: bool = False,
    nbuf: int = 3,
    unroll: int = 1,
    rt_gu: bool = False,
    rt_d: bool = False,
) -> jnp.ndarray:
    """out [N8, D] f32 = sum over used slots of one-hot-gathered expert MLP
    outputs, routing-weighted — the whole MoE layer after routing in ONE
    kernel instance. ``rt_gu``: gate|up words are rt-packed (whole-K tile)
    and ``xp`` is in LOGICAL column order. ``rt_d``: down is rt-packed —
    it consumes the logical-order inner directly (the perm dot drops)."""
    N8, D = xp.shape
    E, Kpf, twoF = qw_gu.shape
    S = expert_ids.shape[0]
    assert twoF == 2 * F and tok_col.shape == (S * bm, 1)
    if unroll > 1:
        # the kernel runs whole groups of ``unroll`` slots with no per-slot
        # guards; pad the plan arrays and round n_used up — extra slots
        # carry tok=-1 (sel gathers nothing) and w=0 (combine adds nothing)
        S_pad = -(-S // unroll) * unroll
        if S_pad != S:
            expert_ids = jnp.concatenate(
                [expert_ids, jnp.zeros(S_pad - S, expert_ids.dtype)])
            tok_col = jnp.concatenate(
                [tok_col, jnp.full(((S_pad - S) * bm, 1), -1, tok_col.dtype)])
            w_col = jnp.concatenate(
                [w_col, jnp.zeros(((S_pad - S) * bm, 1), w_col.dtype)])
            S = S_pad
        n_used = -(-n_used // unroll) * unroll
    Gp, Gp_d = s_gu.shape[1], s_d.shape[1]
    Fpf = F // (32 // bits)
    kernel = functools.partial(
        _qmoe_mlp_e2e_kernel, bits=bits, F=F, G_gu=G_gu, G_d=G_d, bm=bm,
        zc=zc, act=act, nbuf=nbuf, unroll=unroll, rt_gu=rt_gu, rt_d=rt_d,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(),
            in_specs=[vmem, vmem, vmem,
                      any_spec, any_spec, any_spec, any_spec, vmem],
            out_specs=vmem,
            scratch_shapes=[
                pltpu.VMEM((nbuf, Kpf, twoF), qw_gu.dtype),
                pltpu.VMEM((nbuf, Gp, twoF), s_gu.dtype),
                pltpu.VMEM((nbuf, Fpf, D), qw_d.dtype),
                pltpu.VMEM((nbuf, Gp_d, D), s_d.dtype),
                pltpu.SemaphoreType.DMA((nbuf, 4)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N8, D), jnp.float32),
        interpret=interpret,
    )(
        expert_ids, n_used,
        xp, tok_col, w_col, qw_gu, s_gu, qw_d, s_d,
        jnp.asarray(_plane_perm_matrix(F, bits), jnp.bfloat16),
    )


_QMOE_E2E_VMEM_BUDGET = 15 * 2**20  # v5e VMEM: a 16.4 MB-estimate config compiled and ran on chip; stay just under


def qmoe_e2e_nbuf(N: int) -> int:
    """Prefetch depth: 3 for decode-size dispatches, 2 for prefill-size
    (the [N8, D] resident x/out grow with tokens; slots there are
    compute-rich so shallower prefetch costs nothing measurable)."""
    return 3 if N <= 64 else 2


def qmoe_e2e_unroll(N: int) -> int:
    """Slot-loop unroll (GPTQ_TPU_QMOE_UNROLL): measured NEUTRAL on chip
    (session Z10: U2 395.3 vs U1 394.2 us/layer at iid routing; U>=3
    exceeds VMEM) — the per-slot cost is NOT chain latency but serialized
    DMA+compute (6.7 us/slot = 3.4 DMA + 3.3 MXU, no overlap; the slot
    sweep at fixed bytes is exactly linear). Kept opt-in as the recorded
    negative; default 1."""
    env = os.environ.get("GPTQ_TPU_QMOE_UNROLL")
    if env is not None:
        return max(1, int(env))
    return 1


def qmoe_e2e_supported(
    *, bits, D, F, G_gu, G_d, N, bm, act, nbuf: int | None = None,
    unroll: int | None = None, budget: int = _QMOE_E2E_VMEM_BUDGET,
) -> bool:
    """Eligibility + VMEM estimate for the e2e layer kernel. Unlike the
    slot-grid kernel, the resident buffers scale with the TOKEN count N
    (x + f32 out stay in VMEM), not the padded slot count — prefill-size
    dispatches fit by raising ``bm`` (more rows per expert slot, better
    MXU row utilization) instead of falling back to the dense all-expert
    loop (top-8-of-128 there wastes E/topk = 16x the FLOPs)."""
    if bits not in (2, 4, 8):
        return False
    if act not in ("silu", "gelu", "gelu_pytorch_tanh", "gelu_new", "relu"):
        return False
    pf = 32 // bits
    if D % pf or F % pf or (2 * F) % 128 or D % 128:
        return False
    rows_gu = (2 * D // pf) if bits != 8 else (D // pf)
    rows_d = (2 * F // pf) if bits != 8 else (F // pf)
    if rows_gu % G_gu or rows_d % G_d:
        return False
    if unroll is None:
        unroll = qmoe_e2e_unroll(N)
    if nbuf is None:
        nbuf = max(qmoe_e2e_nbuf(N), 2 * unroll)
    U = max(1, unroll)
    N8 = max(8, -(-N // 8) * 8)
    gu_tile = (D // pf) * 2 * F * 4
    d_tile = (F // pf) * D * 4
    x_o = N8 * D * (2 + 4)  # bf16 x + f32 accumulated out
    # per-chain temporaries coexist across the U unrolled slots (review
    # finding r4: the estimate must scale with unroll or GPTQ_TPU_QMOE_
    # UNROLL>=2 under-budgets and hits a Mosaic VMEM failure on chip)
    wa = U * rows_gu * 2 * F * 2  # widest dequant temporary
    inner = U * bm * (2 * F * 4 + F * 2)
    sel = U * bm * N8 * 4
    xg = U * bm * D * 2  # gathered rows
    perm_p = F * F * 2
    est = (nbuf * (gu_tile + d_tile) + x_o + wa + inner + sel + xg
           + perm_p)
    return est <= budget


def qmoe_mlp_forward_e2e(
    x: jnp.ndarray,  # [N, D] token rows (UNpermuted, any float dtype)
    pos: jnp.ndarray,  # [M] slot position per sorted row (plan_slots_jit)
    tok: jnp.ndarray,  # [M] source token per sorted row
    w_sorted: jnp.ndarray,  # [M] routing weight per sorted row
    expert_ids, row_count,
    gu: "StackedQuantExperts", down: "StackedQuantExperts",
    *, act: str, bm: int = 8, interpret: bool = False,
    nbuf: int | None = None, unroll: int | None = None,
) -> jnp.ndarray:
    """Whole post-routing MoE layer: returns [N, D] f32 combined output."""
    from gptqmodel_tpu.ops.pallas_qmatmul import _plane_permute_x

    N, D = x.shape
    if unroll is None:
        unroll = qmoe_e2e_unroll(N)
    if nbuf is None:
        nbuf = max(qmoe_e2e_nbuf(N), 2 * unroll)
    S = expert_ids.shape[0]
    M_pad = S * bm
    N8 = max(8, -(-N // 8) * 8)
    xp8 = jnp.zeros((N8, D), jnp.bfloat16).at[:N].set(x.astype(jnp.bfloat16))
    if not gu.rt:  # rt gate|up consumes x in logical column order
        pf = 32 // gu.bits
        xp8 = _plane_permute_x(xp8, gu.in_features, pf, gu.bits)
    tok_col = jnp.full((M_pad, 1), -1, jnp.int32).at[pos, 0].set(
        tok.astype(jnp.int32)
    )
    w_col = jnp.zeros((M_pad, 1), jnp.float32).at[pos, 0].set(
        w_sorted.astype(jnp.float32)
    )
    n_used = jnp.sum(row_count > 0, dtype=jnp.int32)[None]
    out = qmoe_mlp_e2e(
        xp8, expert_ids, n_used, tok_col, w_col,
        gu.qweight, gu.scales, down.qweight, down.scales,
        bits=gu.bits, G_gu=gu.G, G_d=down.G, F=gu.out_features // 2,
        bm=bm, zc=gu.zero_const, act=act, interpret=interpret, nbuf=nbuf,
        unroll=unroll, rt_gu=gu.rt, rt_d=down.rt,
    )
    return out[:N]


def qmoe_mlp_forward_sorted(
    x_sorted: jnp.ndarray,  # [S*bm, D] bf16 (slot-aligned, UNpermuted)
    expert_ids, row_count,
    gu: "StackedQuantExperts", down: "StackedQuantExperts",
    *, act: str, bm: int = 8, interpret: bool = False,
    out_dtype=jnp.float32, dyn: bool | None = None,
):
    import os

    from gptqmodel_tpu.ops.pallas_qmatmul import _plane_permute_x

    pf = 32 // gu.bits
    xp = _plane_permute_x(x_sorted, gu.in_features, pf, gu.bits)
    if dyn is None:
        dyn = os.environ.get("GPTQ_TPU_QMOE_DYN", "1") != "0"
    if dyn:
        n_used = jnp.sum(row_count > 0, dtype=jnp.int32)[None]
        return qmoe_mlp_matmul_dyn(
            xp, expert_ids, row_count, n_used, gu.qweight, gu.scales,
            down.qweight, down.scales,
            bits=gu.bits, G_gu=gu.G, G_d=down.G, F=gu.out_features // 2,
            bm=bm, zc=gu.zero_const, act=act, interpret=interpret,
            out_dtype=out_dtype,
        )
    return qmoe_mlp_matmul(
        xp, expert_ids, row_count, gu.qweight, gu.scales,
        down.qweight, down.scales,
        bits=gu.bits, G_gu=gu.G, G_d=down.G, F=gu.out_features // 2,
        bm=bm, zc=gu.zero_const, act=act, interpret=interpret,
        out_dtype=out_dtype,
    )


# --------------------------------------------------------------------------
# runtime integration: stacked packed experts + jit-safe slot planning
# --------------------------------------------------------------------------


import dataclasses


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["qweight", "scales"],
    meta_fields=["bits", "G", "zero_const", "in_features", "out_features",
                 "rt"],
)
@dataclasses.dataclass
class StackedQuantExperts:
    """Packed expert weights stacked for the ragged kernel.

    qweight [E, K/pf, N] int32 (interchange layout), scales [E, G_pad, N]
    bf16 (groups zero-padded to a sublane multiple). Uniform sym zero point
    across experts (zero_const)."""

    qweight: jnp.ndarray
    scales: jnp.ndarray
    bits: int = 4
    G: int = 0
    zero_const: float = 8.0
    in_features: int = 0
    out_features: int = 0
    # rt=True: per-expert words hold the whole-K-tile rt layout
    # (pack.rt_row_permutation with block_k == K): magic part ``a`` then
    # extracts a CONTIGUOUS logical row range covering whole groups, so the
    # kernel contracts per-group PARTIAL DOTS with no per-element scale
    # work (the dense _qmm_rt_sym_kernel formulation) and consumes x in
    # LOGICAL order (no plane permute). Round 4: this is what took the e2e
    # MoE kernel from compute-bound 7 us/slot to DMA-bound (session Z11/12).
    rt: bool = False


def plan_slots_jit(flat_e: jnp.ndarray, E: int, bm: int, S: int):
    """In-graph slot plan (static slot count S, aligned layout): returns
    (expert_ids[S], row_count[S], pos[M]) where sorted row r is scattered to
    padded position pos[r] and slot s owns rows [s*bm, s*bm + count_s).

    Same layout as :func:`build_slots`, shape-static for jit."""
    M = flat_e.shape[0]
    cnt = jnp.bincount(flat_e, length=E)  # rows per expert
    ns = -(-cnt // bm)  # slots per expert
    slot_base = jnp.cumsum(ns) - ns  # first slot index of each expert
    row_base = jnp.cumsum(cnt) - cnt  # first sorted row of each expert
    s_idx = jnp.arange(S, dtype=jnp.int32)
    # expert owning slot s: last e with slot_base[e] <= s (0 rows -> 0 slots)
    e_of = jnp.searchsorted(slot_base + ns, s_idx, side="right")
    e_of = jnp.clip(e_of, 0, E - 1).astype(jnp.int32)
    j = s_idx - slot_base[e_of]
    count = jnp.clip(cnt[e_of] - j * bm, 0, bm).astype(jnp.int32)
    count = jnp.where(s_idx < jnp.sum(ns), count, 0)
    # sorted row r (expert e, in-expert rank rho) -> slot_base[e]*bm + rho
    r_idx = jnp.arange(M)
    e_row = flat_e  # caller passes the SORTED expert ids
    rho = r_idx - row_base[e_row]
    pos = (slot_base[e_row] * bm + rho).astype(jnp.int32)
    return e_of, count, pos


def plan_rows_jit(flat_e: jnp.ndarray, E: int, bm: int, S: int):
    """SORT-FREE slot plan for the e2e kernel: returns (expert_ids[S],
    row_count[S], row_pos[M]) where UNSORTED flat row r lands at padded row
    ``row_pos[r]``. Equivalent to argsort(stable) + :func:`plan_slots_jit`
    (same aligned layout, ranks = stable insertion order) but built from a
    one-hot counting sort — a [M, M] strictly-lower-triangular matmul gives
    each row's rank within its expert, so the XLA sort (the priciest op in
    the per-step routing glue) disappears from the decode path."""
    M = flat_e.shape[0]
    onehot = (flat_e[:, None] == jnp.arange(E, dtype=flat_e.dtype)[None, :])
    onehot_f = onehot.astype(jnp.float32)  # [M, E]
    cnt = jnp.sum(onehot, axis=0).astype(jnp.int32)  # rows per expert
    ns = -(-cnt // bm)  # slots per expert
    slot_base = jnp.cumsum(ns) - ns
    # exclusive prefix count per expert == the [M, M] strictly-lower-tri
    # matmul, without materializing M x M (prefill-size M would make that
    # a 67 MB constant at M=4096)
    earlier = jnp.cumsum(onehot_f, axis=0) - onehot_f
    rank = jnp.sum(earlier * onehot_f, axis=1).astype(jnp.int32)  # [M]
    row_pos = (slot_base[flat_e] * bm + rank).astype(jnp.int32)
    s_idx = jnp.arange(S, dtype=jnp.int32)
    e_of = jnp.searchsorted(slot_base + ns, s_idx, side="right")
    e_of = jnp.clip(e_of, 0, E - 1).astype(jnp.int32)
    j = s_idx - slot_base[e_of]
    count = jnp.clip(cnt[e_of] - j * bm, 0, bm).astype(jnp.int32)
    count = jnp.where(s_idx < jnp.sum(ns), count, 0)
    return e_of, count, row_pos


def qmoe_forward_sorted(
    x_sorted: jnp.ndarray,  # [S*bm, K] bf16 (slot-aligned, UNpermuted)
    expert_ids, row_count,
    p: StackedQuantExperts,
    *, bm: int = 8, interpret: bool = False, out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Dequant-matmul all slots against their experts; rows stay aligned."""
    from gptqmodel_tpu.ops.pallas_qmatmul import _plane_permute_x

    pf = 32 // p.bits
    xp = _plane_permute_x(x_sorted, p.in_features, pf, p.bits)
    return qmoe_matmul(
        xp, expert_ids, row_count, p.qweight, p.scales,
        bits=p.bits, G=p.G, bm=bm, zero_const=p.zero_const,
        interpret=interpret, out_dtype=out_dtype,
    )


def fuse_gate_up(sq_g: "StackedQuantExperts", sq_u: "StackedQuantExperts"):
    """Concatenate gate and up stacked experts along the out axis so the
    dispatch streams xs once and launches ONE grouped kernel for both
    projections. Requires identical quant geometry."""
    if (sq_g.bits, sq_g.G, sq_g.zero_const, sq_g.in_features, sq_g.rt) != (
        sq_u.bits, sq_u.G, sq_u.zero_const, sq_u.in_features, sq_u.rt
    ):
        return None
    return StackedQuantExperts(
        qweight=jnp.concatenate([sq_g.qweight, sq_u.qweight], axis=2),
        scales=jnp.concatenate([sq_g.scales, sq_u.scales], axis=2),
        bits=sq_g.bits, G=sq_g.G, zero_const=sq_g.zero_const,
        in_features=sq_g.in_features,
        out_features=sq_g.out_features + sq_u.out_features,
        rt=sq_g.rt,
    )


def stack_packed_experts(experts: list) -> dict | None:
    """Stack a list of per-expert QuantLinear pytrees (gate/up/down naming
    resolved by the caller) into StackedQuantExperts, or None if the
    contract doesn't hold (asym, mixed configs, adapters, planar, g_idx)."""
    import numpy as np

    from gptqmodel_tpu.ops import pack as packing
    from gptqmodel_tpu.ops.qlinear import QuantLinear

    if not experts or not all(isinstance(e, QuantLinear) for e in experts):
        return None
    p0 = experts[0]
    for e in experts:
        if (e.bits, e.group_size, e.in_features, e.out_features) != (
            p0.bits, p0.group_size, p0.in_features, p0.out_features
        ):
            return None
        if (e.planar or e.a8 or e.g_idx is not None or e.bias is not None
                or e.lora_A is not None or e.rot_theta is not None
                or e.had_block or e.zero_const < 0 or e.bits not in (2, 4, 8)):
            return None
        if e.zero_const != p0.zero_const:
            return None
    g = p0.group_size if p0.group_size > 0 else p0.in_features
    if g % (32 // p0.bits) or p0.in_features % g:
        return None
    G = p0.in_features // g
    G_pad = max(8, -(-G // 8) * 8)
    # whole-K-tile rt layout when the geometry allows it: the e2e kernel
    # then contracts group-aligned partial dots (no per-element scale work,
    # session Z11/12) and consumes x unpermuted. GPTQ_TPU_QMOE_RT=0 reverts.
    # subgroup segments default ON: 64-lane static slices compile + win on
    # v5e Mosaic (session Z13: down-rt 205 -> 175.7 us/layer at iid routing)
    rt = (stacked_rt_ok(
              p0.bits, p0.in_features, g,
              subgroup=os.environ.get("GPTQ_TPU_QMOE_RT_SUBGROUP",
                                      "1") == "1")
          and os.environ.get("GPTQ_TPU_QMOE_RT", "1") == "1")
    rt_perm = (packing.rt_row_permutation(p0.in_features, p0.bits,
                                          p0.in_features) if rt else None)
    qws, ss = [], []
    for e in experts:
        qw = np.asarray(e.qweight)
        if e.rt_layout:  # back to interchange layout for the stacked kernel
            qw = packing.unrepack_rt(qw, e.bits, e.rt_block_k)
        if rt:  # whole-K tile rt repack (block_k == in_features)
            codes = packing._unpack_axis0_np(qw, p0.bits)
            qw = packing._pack_axis0_np(codes[rt_perm], p0.bits)
        qws.append(qw)
        s = np.zeros((G_pad, p0.out_features), np.float32)
        s[:G] = np.asarray(e.scales, np.float32)
        ss.append(s)
    return StackedQuantExperts(
        qweight=jnp.asarray(np.stack(qws)),
        scales=jnp.asarray(np.stack(ss).astype(jnp.bfloat16)),
        bits=p0.bits,
        G=G,
        zero_const=float(p0.zero_const),
        in_features=p0.in_features,
        out_features=p0.out_features,
        rt=rt,
    )
