"""Pallas GPTQ block solver — the inner column loop with the work set
resident in VMEM.

The XLA formulation (quantization/gptq.py ``col_body``) carries
``Wb [out, B]`` through a ``fori_loop``: XLA round-trips the carry through
HBM every column, so a llama-8B gate|up concat solve streams ~180 GB and
takes ~210 s/layer on a v5e (measured, session T). Rows are INDEPENDENT
given the per-column scale/zero tables, so this kernel grids over row tiles
and runs all ``B`` columns on a tile that never leaves VMEM — the only HBM
traffic is one read of ``Wb``/params and one write of the four outputs.

Semantics are exactly ``col_body``'s plain path (no GPTAQ P-term, no FOEM
beta — those fall back): per column ``i``::

    q   = clip(round(w_i / s_i) + z_i, 0, maxq)
    dq  = s_i * (q - z_i)
    err = (w_i - dq) / Hbb[i, i]
    L_i = 0.5 * (w_i - dq)^2 / Hbb[i, i]^2
    Wb[:, j > i] -= err * Hbb[i, j]

All math f32, column selection via lane masks (full-width redundant compute
is free relative to the HBM round-trips it replaces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILES = (1024, 512, 256, 128, 64, 32, 16, 8)

# v5e VMEM is ~16 MB/core; leave headroom for Mosaic temporaries.
_MEGA_VMEM_BUDGET = 13 * 2**20


def solver_row_tile(out_f: int) -> int | None:
    for rt in _ROW_TILES:
        if out_f % rt == 0:
            return rt
    return None


def _kernel(w_ref, h_ref, s_ref, z_ref, q_ref, dq_ref, e_ref, l_ref, *,
            B: int, maxq: float):
    Wb = w_ref[:].astype(jnp.float32)  # [rt, B]
    H = h_ref[:].astype(jnp.float32)  # [B, B]
    S = s_ref[:].astype(jnp.float32)
    Z = z_ref[:].astype(jnp.float32)
    rt = Wb.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rt, B), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)

    def body(i, st):
        Wb, Q, Dq, E, L = st
        m = lane == i  # [rt, B] column-i mask
        q = jnp.clip(jnp.round(Wb / S) + Z, 0.0, maxq)
        dq = S * (q - Z)
        row = jnp.sum(H * (sub == i), axis=0)  # Hbb[i, :]
        d = jnp.sum(row * (jnp.arange(B) == i))  # Hbb[i, i]
        diff = Wb - dq
        err_i = jnp.sum(jnp.where(m, diff, 0.0), axis=1) / d  # [rt]
        loss_i = 0.5 * diff * diff / (d * d)
        upd = err_i[:, None] * (row * (jnp.arange(B) > i))[None, :]
        return (
            Wb - upd,
            jnp.where(m, q, Q),
            jnp.where(m, dq, Dq),
            jnp.where(m, err_i[:, None], E),
            jnp.where(m, loss_i, L),
        )

    zeros = jnp.zeros((rt, B), jnp.float32)
    _, Q, Dq, E, L = jax.lax.fori_loop(
        0, B, body, (Wb, zeros, zeros, zeros, zeros)
    )
    q_ref[:] = Q
    dq_ref[:] = Dq
    e_ref[:] = E
    l_ref[:] = L


@functools.partial(jax.jit, static_argnames=("maxq", "rt", "interpret"))
def gptq_block_inner(
    Wb: jnp.ndarray,  # [out, B] f32 current block weights
    Hbb: jnp.ndarray,  # [B, B] f32 Hinv block
    scale_cols: jnp.ndarray,  # [out, B]
    zero_cols: jnp.ndarray,  # [out, B]
    *,
    maxq: int,
    rt: int,
    interpret: bool = False,
):
    """Returns (Qb, Dqb, Eb, Lb), all [out, B] f32 — drop-in replacement for
    the fori_loop in gptq_solve_core's block body."""
    out_f, B = Wb.shape
    grid = (out_f // rt,)
    row_spec = pl.BlockSpec((rt, B), lambda r: (r, 0), memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((B, B), lambda r: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, B=B, maxq=float(maxq))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, h_spec, row_spec, row_spec],
        out_specs=[row_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((out_f, B), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(Wb, Hbb, scale_cols, zero_cols)
    return tuple(outs)


# --------------------------------------------------------------------------
# Whole-solve mega-kernel: W row tile resident across ALL blocks
# --------------------------------------------------------------------------
#
# The block-inner kernel above still leaves the dominant cost in XLA land:
# the scan carries the FULL [out, in] W through HBM every block for the
# trailing update ``W -= Eb @ Hrows`` (~30 GB/layer at llama-8B gate|up,
# session T). Here the grid is (row_tiles, blocks) with the W row tile held
# in a VMEM scratch for the tile's entire lifetime: one manual DMA fetch at
# block 0, then every block — group-param search, inner column loop, and the
# trailing update — runs in VMEM. Only Hinv slabs [B, in] stream per step
# (they pipeline against compute), and the total HBM traffic drops from
# O(blocks · out · in) to O(out·in + out/rt · in²).
#
# Semantics are gptq_solve_core's scan body for the plain path (no GPTAQ P,
# no FOEM β, no MSE search): per block, group scales/zeros from the CURRENT
# (trailing-updated) weights exactly like quantizer.find_params, then the
# error-feedback column loop, then the masked trailing matmul at HIGHEST
# precision (reference gptq.py block loop :1210-1254 semantics).


def mega_row_tile(
    out_f: int, in_f: int, blocksize: int, budget: int = _MEGA_VMEM_BUDGET
) -> int | None:
    """Largest row tile whose working set fits VMEM, or None (fallback)."""
    B = blocksize
    hbytes = 2 * B * in_f * 4  # double-buffered Hinv slab
    if in_f % B:
        return None
    for rt in _ROW_TILES:
        if out_f % rt:
            continue
        wbytes = rt * in_f * 4  # resident W scratch
        iobytes = 2 * 5 * rt * B * 4  # SP/ZP in + Q/Dq/L out, double-buffered
        # live temporaries: 5 fori carries + scale/zero/lane/diff [rt, B]
        # buffers + the trailing-update chunk [rt, 512] + the Hbb f32 copy
        tmp = 9 * rt * B * 4 + rt * 512 * 4 + B * B * 4
        if hbytes + wbytes + iobytes + tmp <= budget:
            return rt
    return None


def _mega_kernel(*refs, B, in_f, maxq, g, sym, static, rt, chunk):
    if static:
        w_hbm, h_ref, sp_ref, zp_ref, q_ref, dq_ref, l_ref, s_ref, z_ref = refs[:9]
    else:
        w_hbm, h_ref, q_ref, dq_ref, l_ref, s_ref, z_ref = refs[:7]
    w_s, sem = refs[-2:]
    r = pl.program_id(0)
    b = pl.program_id(1)
    n_blocks = in_f // B

    @pl.when(b == 0)
    def _fetch_tile():
        cp = pltpu.make_async_copy(w_hbm.at[pl.ds(r * rt, rt), :], w_s, sem)
        cp.start()
        cp.wait()

    i1 = pl.multiple_of(b * B, B)
    Wb = w_s[:, pl.ds(i1, B)].astype(jnp.float32)  # [rt, B]
    Hbb = h_ref[:, pl.ds(i1, B)].astype(jnp.float32)  # [B, B]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rt, B), 1)

    # ---- per-group params for this block (quantizer.find_params minmax) ----
    if static:
        scale_cols = sp_ref[:].astype(jnp.float32)
        zero_cols = zp_ref[:].astype(jnp.float32)
        s_ref[:] = jnp.zeros_like(s_ref)
        z_ref[:] = jnp.zeros_like(z_ref)
    else:
        gpb = B // g
        s_ref[:] = jnp.zeros_like(s_ref)  # rows >= gpb are padding
        z_ref[:] = jnp.zeros_like(z_ref)
        scale_cols = jnp.zeros((rt, B), jnp.float32)
        zero_cols = jnp.zeros((rt, B), jnp.float32)
        for j in range(gpb):  # static unroll, gpb is tiny
            m = (lane >= j * g) & (lane < (j + 1) * g)
            xmin = jnp.minimum(
                jnp.min(jnp.where(m, Wb, jnp.inf), axis=1), 0.0
            )
            xmax = jnp.maximum(
                jnp.max(jnp.where(m, Wb, -jnp.inf), axis=1), 0.0
            )
            if sym:
                xmax = jnp.maximum(jnp.abs(xmin), xmax)
                xmin = jnp.where(xmin < 0, -xmax, xmin)
            degen = (xmin == 0.0) & (xmax == 0.0)
            xmin = jnp.where(degen, -1.0, xmin)
            xmax = jnp.where(degen, 1.0, xmax)
            scale = (xmax - xmin) / maxq
            if sym:
                zero = jnp.full_like(scale, (maxq + 1) / 2.0)
            else:
                zero = jnp.round(-xmin / scale)
            scale_cols = jnp.where(m, scale[:, None], scale_cols)
            zero_cols = jnp.where(m, zero[:, None], zero_cols)
            s_ref[j, :] = scale
            z_ref[j, :] = zero

    # ---- inner column loop (same math as gptq_block_inner) -----------------
    sub = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)

    def body(i, st):
        Wc, Q, Dq, E, L = st
        m = lane == i
        q = jnp.clip(jnp.round(Wc / scale_cols) + zero_cols, 0.0, maxq)
        dq = scale_cols * (q - zero_cols)
        row = jnp.sum(Hbb * (sub == i), axis=0)  # Hbb[i, :]
        d = jnp.sum(row * (jnp.arange(B) == i))
        diff = Wc - dq
        err_i = jnp.sum(jnp.where(m, diff, 0.0), axis=1) / d
        loss_i = 0.5 * diff * diff / (d * d)
        upd = err_i[:, None] * (row * (jnp.arange(B) > i))[None, :]
        return (
            Wc - upd,
            jnp.where(m, q, Q),
            jnp.where(m, dq, Dq),
            jnp.where(m, err_i[:, None], E),
            jnp.where(m, loss_i, L),
        )

    zeros = jnp.zeros((rt, B), jnp.float32)
    _, Q, Dq, E, L = jax.lax.fori_loop(
        0, B, body, (Wb, zeros, zeros, zeros, zeros)
    )
    q_ref[:] = Q
    dq_ref[:] = Dq
    l_ref[:] = L

    # ---- trailing update on the resident tile (chunked MXU dots) -----------
    @pl.when(b + 1 < n_blocks)
    def _trailing():
        for c in range(in_f // chunk):
            off = c * chunk

            @pl.when(off + chunk > i1 + B)  # chunk has columns beyond block
            def _chunk():
                h = h_ref[:, off : off + chunk].astype(jnp.float32)
                gl = off + jax.lax.broadcasted_iota(
                    jnp.int32, (B, chunk), 1
                )
                h = h * (gl >= i1 + B).astype(jnp.float32)
                upd = jax.lax.dot_general(
                    E,
                    h,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                w_s[:, off : off + chunk] = w_s[:, off : off + chunk] - upd


@functools.partial(
    jax.jit,
    static_argnames=("maxq", "group_size", "sym", "blocksize", "rt",
                     "static", "interpret"),
)
def gptq_whole_solve(
    W: jnp.ndarray,  # [out, in] f32, permuted + dead-zeroed
    Hinv_u: jnp.ndarray,  # [in, in] f32 upper Cholesky factor of Hd⁻¹
    SP: jnp.ndarray | None = None,  # [out, in] static per-column scales
    ZP: jnp.ndarray | None = None,
    *,
    maxq: int,
    group_size: int,
    sym: bool,
    blocksize: int,
    rt: int,
    static: bool,
    interpret: bool = False,
):
    """Full GPTQ error-feedback solve in one pallas_call.

    Returns (Q, Dq, L, s_out, z_out): codes/dequant/losses [out, in] f32 and
    per-group params [n_blocks·gpb, out] (garbage rows when ``static`` —
    the caller already holds the tables).
    """
    out_f, in_f = W.shape
    B = blocksize
    nb = in_f // B
    gpb = 1 if static else B // group_size
    gp_pad = 8  # Mosaic: block sublane dim must be a multiple of 8
    assert gpb <= gp_pad, (gpb, gp_pad)
    chunk = 512 if in_f % 512 == 0 else B
    grid = (out_f // rt, nb)
    kernel = functools.partial(
        _mega_kernel, B=B, in_f=in_f, maxq=float(maxq), g=group_size,
        sym=sym, static=static, rt=rt, chunk=chunk,
    )
    row_blk = pl.BlockSpec((rt, B), lambda r, b: (r, b), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # W stays in HBM; manual DMA
        pl.BlockSpec((B, in_f), lambda r, b: (b, 0), memory_space=pltpu.VMEM),
    ]
    args = [W, Hinv_u]
    if static:
        in_specs += [row_blk, row_blk]
        args += [SP, ZP]
    gp_blk = pl.BlockSpec(
        (gp_pad, rt), lambda r, b: (b, r), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[row_blk] * 3 + [gp_blk] * 2,
        out_shape=[jax.ShapeDtypeStruct((out_f, in_f), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((nb * gp_pad, out_f), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((rt, in_f), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    Q, Dq, L, s_pad, z_pad = outs
    # strip the sublane padding: [nb, gp_pad, out] -> [nb*gpb, out]
    s_out = s_pad.reshape(nb, gp_pad, out_f)[:, :gpb].reshape(nb * gpb, out_f)
    z_out = z_pad.reshape(nb, gp_pad, out_f)[:, :gpb].reshape(nb * gpb, out_f)
    return Q, Dq, L, s_out, z_out
