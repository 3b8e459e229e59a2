"""ParoQuant: learned pairwise-rotation quantization (TPU-native).

Reference: quantization/paroquant/optimization.py (adapted from the
ParoQuant paper, arxiv 2511.10645) + the fused CUDA rotation kernel
(gptqmodel_ext/paroquant/rotation.cu). Semantics:

- transform domain: per-channel scales ``s`` + ``R`` rounds of DISJOINT
  within-group Givens rotations; ``x̃ = (x ∘ s) · Rot(θ)``,
  ``W̃ = (W / s) · Rot(θ)`` — so ``x̃ @ W̃ᵀ == x @ Wᵀ`` exactly and only
  the quantization error of W̃ survives.
- calibration learns (θ, log s) by Adam on the EXPECTED output error in
  Hessian form: ``loss = Tr(ΔW̃ · H̃ · ΔW̃ᵀ)`` with
  ``H̃ = Rotᵀ S H S Rot`` and STE rounding through the per-group affine
  quantizer. (The reference replays sampled activation rows; the Hessian
  form is the same expectation computed from the statistic the looper
  already accumulates — no activation storage, fully jittable.)
- runtime: activations are rotated before the packed matmul
  (registry.qlinear_forward applies ``apply_paro`` when rot_theta is set);
  rotation pairs are a deterministic round-robin template, so only θ and s
  ship in the checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def paro_pairs(group: int, rounds: int) -> np.ndarray:
    """Round-robin tournament pairings: [rounds, group/2, 2] disjoint pairs
    per round, every channel in exactly one pair each round."""
    assert group % 2 == 0
    arr = list(range(group))
    out = []
    for _ in range(rounds):
        out.append([[arr[i], arr[group - 1 - i]] for i in range(group // 2)])
        # circle method: fix arr[0], rotate the rest
        arr = [arr[0]] + [arr[-1]] + arr[1:-1]
    return np.asarray(out, np.int32)


@lru_cache(maxsize=None)
def _abs_indices(h: int, group: int, rounds: int):
    """Absolute (i, j) index vectors per round: [rounds, h/2] each."""
    pairs = paro_pairs(group, rounds)  # [R, g/2, 2]
    ng = h // group
    offs = (np.arange(ng) * group)[None, :, None]  # [1, ng, 1]
    I = (pairs[:, None, :, 0] + offs).reshape(rounds, -1)
    J = (pairs[:, None, :, 1] + offs).reshape(rounds, -1)
    # numpy (NOT jnp): the cache is shared across traces — device arrays
    # created inside a jit would leak tracers
    return np.ascontiguousarray(I), np.ascontiguousarray(J)


def apply_paro(
    x: jnp.ndarray,  # [..., h]
    theta: jnp.ndarray,  # [R, h/2] (per round, per absolute pair)
    scales: jnp.ndarray | None,  # [h] channel scales (None = ones)
    group: int,
    inverse: bool = False,
) -> jnp.ndarray:
    """Forward transform ``(x ∘ s) · Rot(θ)`` (or its exact inverse)."""
    h = x.shape[-1]
    R = theta.shape[0]
    I, J = _abs_indices(h, group, R)
    if not inverse and scales is not None:
        x = x * scales.astype(x.dtype)
    rounds = range(R - 1, -1, -1) if inverse else range(R)
    for r in rounds:
        th = theta[r].astype(jnp.float32)
        c = jnp.cos(th).astype(x.dtype)
        s = jnp.sin(th).astype(x.dtype)
        if inverse:
            s = -s
        xi = jnp.take(x, I[r], axis=-1)
        xj = jnp.take(x, J[r], axis=-1)
        x = x.at[..., I[r]].set(xi * c + xj * s)
        x = x.at[..., J[r]].set(-xi * s + xj * c)
    if inverse and scales is not None:
        x = x / scales.astype(x.dtype)
    return x


def _ste_round(x):
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _quantize_groups_ste(Wt, bits: int, g: int):
    """Per-(out, in-group) affine quantize with STE rounding; returns
    (dequantized W, scales [G,out], zeros [G,out]) — GPTQ granularity."""
    out_f, h = Wt.shape
    G = h // g
    maxq = 2**bits - 1
    view = Wt.reshape(out_f, G, g)
    mn = jnp.min(view, axis=-1)
    mx = jnp.max(view, axis=-1)
    qs = jnp.maximum(mx - mn, 1e-5) / maxq  # [out, G]
    z = jnp.clip(_ste_round(-mn / qs), 0, maxq)
    q = jnp.clip(_ste_round(view / qs[..., None] + z[..., None]), 0, maxq)
    dq = (q - z[..., None]) * qs[..., None]
    return dq.reshape(out_f, h), qs.T, z.T


@dataclass
class ParoResult:
    theta: np.ndarray  # [R, h/2]
    chan_scales: np.ndarray  # [h]
    Q: np.ndarray  # int codes [out, in] (transformed domain)
    scales: np.ndarray  # [G, out]
    zeros: np.ndarray  # [G, out]
    Wq_t: np.ndarray  # dequantized transformed weights [out, in]
    avg_loss: float
    loss_history: list


@partial(jax.jit, static_argnames=("bits", "group_size", "rot_group", "rounds"))
def _paro_loss_and_grad(params, W, H, *, bits, group_size, rot_group, rounds):
    def loss_fn(p):
        theta, log_s = p
        s = jnp.exp(log_s)
        Wt = apply_paro(W / s[None, :], theta, None, rot_group)
        M = H * s[:, None] * s[None, :]
        Ht = apply_paro(apply_paro(M, theta, None, rot_group).T, theta, None, rot_group)
        dqW, _, _ = _quantize_groups_ste(Wt, bits, group_size)
        dW = dqW - Wt
        return jnp.einsum("oi,ij,oj->", dW, Ht, dW, precision="highest")

    return jax.value_and_grad(loss_fn)(params)


def paroquant_optimize(
    W,
    H,
    *,
    bits: int,
    group_size: int,
    rot_group: int = 128,
    rounds: int = 4,
    steps: int = 64,
    lr: float = 5e-3,
    scale_lr: float = 1e-3,
    nsamples: int = 0,
) -> ParoResult:
    """Learn (θ, s), then quantize the transformed weights.

    ``W`` [out, in] f32, ``H`` normalized Hessian [in, in]. The identity
    init (θ=0, s=1) means step 0 equals plain per-group RTN; optimization
    can only improve the Hessian-weighted error (best-state tracking)."""
    import optax

    W = jnp.asarray(W, jnp.float32)
    H = jnp.asarray(H, jnp.float32)
    out_f, h = W.shape
    g = h if group_size in (-1, None) else group_size
    rg = min(rot_group, h)
    while h % rg:  # rotation group must divide the feature dim
        rg //= 2
    theta = jnp.zeros((rounds, h // 2), jnp.float32)
    log_s = jnp.zeros((h,), jnp.float32)
    params = (theta, log_s)
    opt = optax.multi_transform(
        {"theta": optax.adam(lr), "log_s": optax.adam(scale_lr)},
        ("theta", "log_s"),
    )
    opt_state = opt.init(params)

    best = (np.inf, params)
    history = []
    for step in range(steps):
        loss, grads = _paro_loss_and_grad(
            params, W, H, bits=bits, group_size=g, rot_group=rg, rounds=rounds
        )
        lv = float(loss)
        history.append(lv)
        if lv < best[0]:
            best = (lv, params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)

    theta, log_s = best[1]
    s = jnp.exp(log_s)
    Wt = apply_paro(W / s[None, :], theta, None, rg)
    dqW, qs, z = _quantize_groups_ste(Wt, bits, g)
    # integer codes for packing (same formula, no STE)
    view = np.asarray(Wt).reshape(out_f, h // g, g)
    qs_np = np.asarray(qs).T  # [out, G]
    z_np = np.asarray(z).T
    Q = np.clip(
        np.round(view / qs_np[..., None] + z_np[..., None]), 0, 2**bits - 1
    ).astype(np.int32).reshape(out_f, h)
    return ParoResult(
        theta=np.asarray(theta),
        chan_scales=np.asarray(s),
        Q=Q,
        scales=np.asarray(qs),
        zeros=np.asarray(z),
        Wq_t=np.asarray(dqW),
        avg_loss=best[0] / max(nsamples, 1),
        loss_history=history,
    )
