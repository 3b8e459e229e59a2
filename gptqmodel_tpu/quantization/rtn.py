"""RTN — round-to-nearest weight-only quantization (reference
gptqmodel/quantization/rtn.py:31). Also serves as the failsafe path for
modules with insufficient calibration (dead MoE experts) and the
``mock_quantization`` fast path."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gptqmodel_tpu.quantization.quantizer import find_params, quantize


@partial(jax.jit, static_argnames=("bits", "group_size", "sym", "mse"))
def rtn_quantize_core(W, *, bits: int, group_size: int, sym: bool, mse: bool = False):
    """Quantize ``W [out, in]`` group-wise, no calibration.

    Returns (Q [out,in] int32, Wq [out,in] f32, scales [G,out], zeros [G,out]).
    """
    W = W.astype(jnp.float32)
    out_f, in_f = W.shape
    g = in_f if group_size in (-1, None) else group_size
    maxq = 2**bits - 1
    grouped = W.reshape(out_f, in_f // g, g).transpose(1, 0, 2)  # [G, out, g]
    scales, zeros = find_params(grouped, bits=bits, sym=sym, mse=mse)
    q = quantize(grouped, scales[..., None], zeros[..., None], maxq)
    wq = scales[..., None] * (q - zeros[..., None])
    Q = q.transpose(1, 0, 2).reshape(out_f, in_f).astype(jnp.int32)
    Wq = wq.transpose(1, 0, 2).reshape(out_f, in_f)
    return Q, Wq, scales, zeros


def rtn_quantize(W, *, bits: int, group_size: int, sym: bool, mse: bool = False):
    from gptqmodel_tpu.quantization.gptq import GPTQResult

    Q, Wq, scales, zeros = rtn_quantize_core(
        jnp.asarray(W), bits=bits, group_size=group_size, sym=sym, mse=mse
    )
    in_f = W.shape[1]
    g = in_f if group_size in (-1, None) else group_size
    return GPTQResult(
        Q=np.asarray(Q),
        Wq=np.asarray(Wq),
        scales=np.asarray(scales),
        zeros=np.asarray(zeros),
        g_idx=np.arange(in_f, dtype=np.int32) // g,
        perm=None,
        avg_loss=float(
            np.mean(
                (np.asarray(Wq, np.float64) - np.asarray(W, np.float64)) ** 2
            )
        ),
        damp=0.0,
        nsamples=0,
    )
