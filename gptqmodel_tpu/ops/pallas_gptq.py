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
