"""Uniform affine weight quantizer (scale/zero search).

Semantics match the reference quantizer (gptqmodel/quantization/quantizer.py:
``find_params`` minmax + MSE grid-shrink search, sym zero = (maxq+1)/2,
asym zero = round(-xmin/scale)) but are implemented as pure, vmappable JAX
functions operating on a trailing "group" axis, so the same code runs per
channel, per group, or per tensor and jits cleanly on TPU.

Conventions:
  * weights are fp32 arrays shaped ``[..., group_len]`` — params are computed
    over the last axis.
  * integer codes q are in ``[0, maxq]`` with ``maxq = 2**bits - 1``;
    dequant is ``scale * (q - zero)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# MSE grid-shrink search constants (reference defaults: maxshrink=0.8,
# grid=100, norm=2.4).
MSE_MAXSHRINK = 0.8
MSE_GRID = 100
MSE_NORM = 2.4


def _minmax(x: jnp.ndarray, sym: bool):
    """Per-row min/max with the reference's zero-inclusion + sym folding."""
    xmin = jnp.minimum(jnp.min(x, axis=-1), 0.0)
    xmax = jnp.maximum(jnp.max(x, axis=-1), 0.0)
    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    # all-zero rows -> unit range so scale != 0
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)
    return xmin, xmax


def _params_from_range(xmin, xmax, maxq: int, sym: bool):
    scale = (xmax - xmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2.0)
    else:
        zero = jnp.round(-xmin / scale)
    return scale, zero


def quantize(x, scale, zero, maxq: int):
    """x -> integer codes in [0, maxq]. scale/zero broadcast against x."""
    q = jnp.clip(jnp.round(x / scale) + zero, 0, maxq)
    return q


def dequantize(q, scale, zero):
    return scale * (q - zero)


def quantize_dequantize(x, scale, zero, maxq: int):
    return dequantize(quantize(x, scale, zero, maxq), scale, zero)


@partial(jax.jit, static_argnames=("bits", "sym", "mse"))
def find_params(
    x: jnp.ndarray,
    *,
    bits: int,
    sym: bool,
    mse: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (scale, zero) over the last axis of ``x``.

    Returns arrays shaped like ``x.shape[:-1]``. With ``mse=True`` runs the
    reference's grid-shrink search: try p ∈ {1 - i/grid} down to maxshrink,
    keep the (scale, zero) minimizing sum |dq - x|^norm.
    """
    maxq = 2**bits - 1
    xmin, xmax = _minmax(x.astype(jnp.float32), sym)
    scale, zero = _params_from_range(xmin, xmax, maxq, sym)

    if not mse:
        return scale, zero

    best_err = jnp.full(x.shape[:-1], jnp.inf, dtype=jnp.float32)

    def body(i, carry):
        best_err, best_scale, best_zero = carry
        p = 1.0 - i.astype(jnp.float32) / MSE_GRID
        s, z = _params_from_range(p * xmin, p * xmax, maxq, sym)
        dq = quantize_dequantize(x, s[..., None], z[..., None], maxq)
        err = jnp.sum(
            jnp.abs(dq - x) ** MSE_NORM, axis=-1, dtype=jnp.float32
        )
        better = err < best_err
        return (
            jnp.where(better, err, best_err),
            jnp.where(better, s, best_scale),
            jnp.where(better, z, best_zero),
        )

    n_steps = int(MSE_MAXSHRINK * MSE_GRID)
    best_err, scale, zero = jax.lax.fori_loop(
        0, n_steps, body, (best_err, scale, zero)
    )
    return scale, zero


def find_params_grouped(
    w: jnp.ndarray, *, bits: int, group_size: int, sym: bool, mse: bool = False
):
    """Group-wise params for a weight matrix ``w [out, in]``.

    Returns (scale, zero) shaped ``[n_groups, out]`` (reference scales layout)
    where group g covers input columns ``[g*group_size, (g+1)*group_size)``.
    ``group_size=-1`` means one group spanning all inputs.
    """
    out_f, in_f = w.shape
    g = in_f if group_size in (-1, None) else group_size
    assert in_f % g == 0, f"in_features {in_f} % group_size {g} != 0"
    grouped = w.reshape(out_f, in_f // g, g).transpose(1, 0, 2)  # [G, out, g]
    scale, zero = find_params(grouped, bits=bits, sym=sym, mse=mse)
    return scale, zero  # [G, out]
