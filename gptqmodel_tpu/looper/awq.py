"""AWQ: activation-aware weight quantization (scale + clip search).

Re-designs the reference AWQProcessor (gptqmodel/looper/awq_processor.py:
``_search_best_scale`` :1118, ``_search_best_clip`` :1213,
``pseudo_quantize_tensor`` :1304) for TPU:

- The search loss ``||x @ (dq(W') - W)ᵀ||²`` is evaluated EXACTLY as
  ``Σ_o Δ_o G Δ_oᵀ`` with ``G = Σ xᵀx`` — the same statistic the GPTQ path
  accumulates — instead of re-running sampled activation matmuls per
  candidate. One jitted grid sweep per module group, no activation storage.
- Per-channel activation magnitudes (Σ|x|) ride along in the same
  accumulation step.
- Scale folding is functional: the returned fold vector is applied to the
  preceding norm's weight (or the producing linear's rows), exactly the
  standard AWQ fold; modules whose input isn't foldable (GQA o_proj) keep
  s = 1 (reference awq_scale_optimize_shape_dependent_modules note,
  definitions/llama.py:15).

Output is RTN-quantized scaled weights in the standard GPTQ pack formats.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gptqmodel_tpu.quantization.quantizer import find_params, quantize

N_SCALE_GRID = 20
N_CLIP_GRID = 10
CLIP_MIN_RATIO = 0.5


def _rtn_dq(W, bits: int, group_size: int, sym: bool):
    """Quantize-dequantize [out, in] group-wise (pseudo-quantization)."""
    out_f, in_f = W.shape
    g = in_f if group_size in (-1, None) else group_size
    maxq = 2**bits - 1
    grouped = W.reshape(out_f, in_f // g, g)
    s, z = find_params(grouped, bits=bits, sym=sym)
    q = quantize(grouped, s[..., None], z[..., None], maxq)
    return (s[..., None] * (q - z[..., None])).reshape(out_f, in_f)


def _hessian_loss(delta, G):
    """Σ_o Δ_o G Δ_oᵀ — exact calibration MSE of a weight perturbation."""
    return jnp.einsum("oi,ij,oj->", delta, G, delta, precision="highest")


@partial(jax.jit, static_argnames=("bits", "group_size", "sym", "n_grid"))
def search_scale(
    W: jnp.ndarray,  # [out, in] (concat of the input group's members)
    G: jnp.ndarray,  # [in, in] Σ xᵀx
    x_absmean: jnp.ndarray,  # [in] mean |x| per channel
    *,
    bits: int,
    group_size: int,
    sym: bool,
    n_grid: int = N_SCALE_GRID,
):
    """Grid-search the AWQ channel scale exponent α; returns (s [in], best_loss).

    Candidate s = (x_absmean^α / w_absmean^(1-α)), normalized. Loss of a
    candidate: quantize W·s, unscale, Hessian-exact MSE vs original W.
    """
    W = W.astype(jnp.float32)
    w_absmean = jnp.mean(jnp.abs(W), axis=0) + 1e-8
    xm = x_absmean + 1e-8

    def candidate_loss(alpha):
        s = jnp.power(xm, alpha) / jnp.power(w_absmean, 1.0 - alpha)
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s) + 1e-12)
        s = jnp.clip(s, 1e-4, 1e4)
        dq = _rtn_dq(W * s[None, :], bits, group_size, sym) / s[None, :]
        return _hessian_loss(dq - W, G), s

    alphas = jnp.linspace(0.0, 1.0, n_grid)
    losses, scales = jax.lax.map(candidate_loss, alphas)
    best = jnp.argmin(losses)
    return scales[best], losses[best]


@partial(jax.jit, static_argnames=("bits", "group_size", "sym", "n_grid"))
def search_clip(
    W: jnp.ndarray,  # [out, in] (already scaled)
    G: jnp.ndarray,  # [in, in] of the SCALED input domain
    *,
    bits: int,
    group_size: int,
    sym: bool,
    n_grid: int = N_CLIP_GRID,
):
    """Per-output-channel max-clip search. Returns clipped W.

    Candidate r shrinks each quantization group's observed range to r·max;
    the best r per output channel minimizes the Hessian-exact row loss."""
    W = W.astype(jnp.float32)
    out_f, in_f = W.shape

    def candidate(ratio):
        g = in_f if group_size in (-1, None) else group_size
        grouped = W.reshape(out_f, in_f // g, g)
        lim = jnp.max(jnp.abs(grouped), axis=-1, keepdims=True) * ratio
        clipped = jnp.clip(grouped, -lim, lim).reshape(out_f, in_f)
        dq = _rtn_dq(clipped, bits, group_size, sym)
        delta = dq - W
        # per-row loss: Δ_o G Δ_oᵀ
        row_loss = jnp.einsum("oi,ij,oj->o", delta, G, delta, precision="highest")
        return row_loss, clipped

    ratios = jnp.linspace(1.0, CLIP_MIN_RATIO, n_grid)
    row_losses, clipped_all = jax.lax.map(candidate, ratios)  # [n, out], [n, out, in]
    best = jnp.argmin(row_losses, axis=0)  # [out]
    W_clipped = jnp.take_along_axis(
        clipped_all, best[None, :, None], axis=0
    )[0]
    return W_clipped


def scaled_hessian(G: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """G of the scaled input domain x' = x/s: diag(1/s) G diag(1/s)."""
    inv = 1.0 / s
    return G * inv[:, None] * inv[None, :]


def fold_scale_into_norm(norm_weight, s):
    return (jnp.asarray(norm_weight, jnp.float32) / s).astype(norm_weight.dtype)


def fold_scale_into_linear_rows(weight, bias, s):
    """Producing linear: its output channel c feeds input channel c of the
    scaled module -> divide row c (and bias) by s[c]."""
    w = (jnp.asarray(weight, jnp.float32) / s[:, None]).astype(weight.dtype)
    b = None
    if bias is not None:
        b = (jnp.asarray(bias, jnp.float32) / s).astype(bias.dtype)
    return w, b
