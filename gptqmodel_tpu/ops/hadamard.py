"""Fast Walsh-Hadamard transform — the online-rotation op.

TPU-native replacement for the reference's CUDA hadamard extension
(gptqmodel_ext/hadamard/, Dao-AILab FHT vendored; applied at runtime via
``set_had_K``, qlinear/__init__.py:485): log2(b) butterfly passes of adds,
fully fusible by XLA — no kernel needed at these sizes.

Blockwise semantics: ``fht(x, b)`` applies ``I_{n/b} ⊗ H_b`` to the last
dim (b = power of two). Non-power-of-two feature dims use the largest
power-of-two block divisor (grouped-Hadamard, the QuaRot had_K pattern).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def largest_pow2_divisor(n: int) -> int:
    return n & (-n)


def fht(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """Normalized blockwise FWHT on the last dim (orthogonal)."""
    n = x.shape[-1]
    assert block & (block - 1) == 0 and n % block == 0, (n, block)
    lead = x.shape[:-1]
    v = x.reshape(*lead, n // block, block)
    h = 1
    while h < block:
        v = v.reshape(*lead, n // block, block // (2 * h), 2, h)
        a = v[..., 0, :]
        b = v[..., 1, :]
        v = jnp.stack([a + b, a - b], axis=-2)
        h *= 2
    v = v.reshape(*lead, n)
    return v * jnp.asarray(1.0 / np.sqrt(block), x.dtype)


def fht_np(x: np.ndarray, block: int) -> np.ndarray:
    """Numpy twin (host-side weight folds)."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    v = x.reshape(*lead, n // block, block).astype(np.float64)
    h = 1
    while h < block:
        v = v.reshape(*lead, n // block, block // (2 * h), 2, h)
        a, b = v[..., 0, :], v[..., 1, :]
        v = np.stack([a + b, a - b], axis=-2)
        h *= 2
    return (v.reshape(*lead, n) / np.sqrt(block)).astype(x.dtype)
