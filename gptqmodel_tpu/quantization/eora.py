"""EoRA: eigenspace low-rank adapters compensating quantization error.

Re-designs the reference EoRA (gptqmodel/eora/eora.py:80-138
``eora_compute_lora``; processor looper/eora_processor.py): the quantization
delta ``ΔW = W - Wq`` is projected into the eigenspace of the input
covariance ``Σ = E[xxᵀ]`` (eigen-scaled), truncated to rank r by SVD, and
un-projected — i.e. the SVD minimizes the *activation-weighted* error
``||x ΔWᵀ||`` rather than the plain Frobenius norm.

TPU-native detail: the covariance is the same ``G = Σ xᵀx`` statistic the
GPTQ path already accumulates, so adapter generation is a free by-product of
quantization (the reference runs a separate capture pass with eigh on GPU).
Applied as ``y += (x @ A) @ B`` with A [in, r], B [r, out]
(reference adapter/adapter.py:148).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_eora(
    delta: jnp.ndarray,  # [out, in] = W - Wq (original column order)
    G: jnp.ndarray,  # [in, in] Σ xᵀx
    rank: int,
    eig_floor: float = 1e-6,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (A [in, r], B [r, out]) minimizing ||x ΔWᵀ|| at rank r."""
    delta = jnp.asarray(delta, jnp.float32)
    G = jnp.asarray(G, jnp.float32)
    G = (G + G.T) * 0.5
    lam, Q = jnp.linalg.eigh(G)
    lam = jnp.maximum(lam, eig_floor * jnp.max(lam))
    sqrt_l = jnp.sqrt(lam)
    # scaling S = Q diag(sqrt λ); delta_scaled = ΔW · S   [out, in]
    S = Q * sqrt_l[None, :]
    Sinv = Q * (1.0 / sqrt_l)[None, :]  # S⁻ᵀ... (Q orthogonal: S⁻¹ = diag(1/√λ) Qᵀ)
    delta_scaled = delta @ S
    U, sv, Vt = jnp.linalg.svd(delta_scaled, full_matrices=False)
    r = min(rank, sv.shape[0])
    B = (U[:, :r] * sv[:r][None, :]).T  # [r, out]ᵀ pieces: U_r Σ_r
    # A' (scaled domain) = V_rᵀ; un-scale: A = S⁻ᵀ V_r = Sinv @ V_r? derive:
    # ΔW ≈ U Σ Vᵀ S⁻¹  (since ΔW·S ≈ UΣVᵀ)  =>  ΔW ≈ (UΣ) (Vᵀ S⁻¹)
    # y correction = x ΔWᵀ = x (Vᵀ S⁻¹)ᵀ (UΣ)ᵀ = (x @ S⁻ᵀ V) @ (ΣᵀUᵀ)
    A = Sinv @ Vt[:r].T  # [in, r]
    return np.asarray(A), np.asarray(B)  # A [in,r], B [r,out]


def eora_correction_quality(delta, G, A, B) -> tuple[float, float]:
    """(weighted err before, after) — for tests/telemetry."""
    delta = jnp.asarray(delta, jnp.float32)
    resid = delta - (A @ B).T  # ΔW - (B^T A^T)... check: (x@A)@B adds x·(A·B)
    def werr(D):
        return float(jnp.einsum("oi,ij,oj->", D, G, D, precision="highest"))
    return werr(delta), werr(resid)
