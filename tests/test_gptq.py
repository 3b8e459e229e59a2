"""GPTQ solver validation.

Oracle: an independent, naive per-column NumPy implementation of the GPTQ
update rule (from the published algorithm), written here from first
principles. The blocked lax.scan solver must match it to fp32 tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gptqmodel_tpu.quantization.gptq import (
    accumulate_hessian,
    gptq_quantize,
    gptq_solve_core,
    hessian_inverse,
    init_hessian,
)
from gptqmodel_tpu.quantization.rtn import rtn_quantize


# ----------------------------------------------------------------- oracle


def _find_params_np(x, bits, sym):
    """x: [out, g] -> scale, zero per row (matches quantizer.find_params)."""
    maxq = 2**bits - 1
    xmin = np.minimum(x.min(axis=-1), 0.0)
    xmax = np.maximum(x.max(axis=-1), 0.0)
    if sym:
        xmax = np.maximum(np.abs(xmin), xmax)
        xmin = np.where(xmin < 0, -xmax, xmin)
    deg = (xmin == 0) & (xmax == 0)
    xmin = np.where(deg, -1.0, xmin)
    xmax = np.where(deg, 1.0, xmax)
    scale = (xmax - xmin) / maxq
    if sym:
        zero = np.full_like(scale, (maxq + 1) / 2)
    else:
        zero = np.round(-xmin / scale)
    return scale, zero


def _gptq_oracle(W, Hinv_u, bits, group_size, sym, blocksize=128):
    """Naive blocked GPTQ (numpy, fp32), per-column."""
    W = W.astype(np.float32).copy()
    out_f, in_f = W.shape
    g = in_f if group_size == -1 else group_size
    maxq = 2**bits - 1
    Q = np.zeros_like(W)
    Wq = np.zeros_like(W)
    if g == in_f:
        scale, zero = _find_params_np(W, bits, sym)
    for i1 in range(0, in_f, blocksize):
        i2 = min(i1 + blocksize, in_f)
        W1 = W[:, i1:i2].copy()
        Hinv1 = Hinv_u[i1:i2, i1:i2]
        Err1 = np.zeros_like(W1)
        for i in range(i2 - i1):
            w = W1[:, i]
            d = Hinv1[i, i]
            if g != in_f and (i1 + i) % g == 0:
                scale, zero = _find_params_np(W[:, i1 + i : i1 + i + g], bits, sym)
            q = np.clip(np.round(w / scale) + zero, 0, maxq)
            dq = scale * (q - zero)
            Q[:, i1 + i] = q
            Wq[:, i1 + i] = dq
            err = (w - dq) / d
            W1[:, i + 1 :] -= err[:, None] * Hinv1[i, i + 1 :][None, :]
            Err1[:, i] = err
        W[:, i2:] -= Err1 @ Hinv_u[i1:i2, i2:]
    return Q, Wq


def _make_problem(out_f=32, in_f=256, n=512, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(out_f, in_f)).astype(np.float32)
    # correlated activations so GPTQ error feedback matters
    base = rng.normal(size=(n, in_f // 4)).astype(np.float32)
    mix = rng.normal(size=(in_f // 4, in_f)).astype(np.float32)
    X = base @ mix + 0.1 * rng.normal(size=(n, in_f)).astype(np.float32)
    return W, X


@pytest.mark.parametrize("group_size,sym,bits", [
    (128, True, 4),
    (64, False, 4),
    (-1, True, 4),
    (32, True, 3),
    (128, False, 8),
    (256, True, 4),
])
def test_solver_matches_oracle(group_size, sym, bits):
    W, X = _make_problem()
    H, n = init_hessian(X.shape[1]), jnp.int32(0)
    H, n = accumulate_hessian(H, n, jnp.asarray(X))
    Hn = np.asarray(H)
    # oracle uses the same damped inverse factor
    U, _ = hessian_inverse(H, 0.01)
    Q_o, Wq_o = _gptq_oracle(W, np.asarray(U), bits, group_size, sym)
    res = gptq_solve_core(
        jnp.asarray(W), U, bits=bits, group_size=group_size, sym=sym
    )
    Q_j = np.asarray(res["Q"])
    Wq_j = np.asarray(res["Wq"])
    # codes should agree except for rare round-boundary ties
    mismatch = np.mean(Q_j != Q_o)
    assert mismatch < 2e-3, f"code mismatch rate {mismatch}"
    np.testing.assert_allclose(Wq_j, Wq_o, rtol=1e-3, atol=1e-3)
    assert np.isfinite(Hn).all()


def test_gptq_beats_rtn():
    W, X = _make_problem(out_f=64, in_f=256, n=1024)
    H, n = init_hessian(256), jnp.int32(0)
    H, n = accumulate_hessian(H, n, jnp.asarray(X))
    res = gptq_quantize(
        W, H, bits=4, group_size=128, sym=True, nsamples=int(n)
    )
    rtn = rtn_quantize(W, bits=4, group_size=128, sym=True)
    err_gptq = np.linalg.norm(X @ (W - res.Wq).T)
    err_rtn = np.linalg.norm(X @ (W - rtn.Wq).T)
    assert err_gptq < err_rtn * 0.9, (err_gptq, err_rtn)


@pytest.mark.parametrize("mode", ["desc_act", "gar"])
def test_permuted_quantize_roundtrip(mode):
    W, X = _make_problem()
    H, n = init_hessian(256), jnp.int32(0)
    H, n = accumulate_hessian(H, n, jnp.asarray(X))
    res = gptq_quantize(
        W, H, bits=4, group_size=64, sym=True,
        desc_act=(mode == "desc_act"),
        act_group_aware=(mode == "gar"),
        nsamples=int(n),
    )
    # dequant via scales/g_idx must reproduce Wq exactly
    scales = res.scales  # [G, out]
    zeros = res.zeros
    recon = scales[res.g_idx, np.arange(256)[None, :] * 0 + np.arange(W.shape[0])[:, None] * 0]
    # proper gather: column j uses group g_idx[j]
    s_cols = scales[res.g_idx].T  # [out, in]
    z_cols = zeros[res.g_idx].T
    if mode == "gar":
        perm = res.perm
        q_perm = res.Q[:, perm]
        # GAR keeps groups contiguous in permuted space
        g_sorted = np.sort(res.g_idx[perm].reshape(-1, 64), axis=1)
        assert (g_sorted[:, 0] == g_sorted[:, -1]).all()
    np.testing.assert_allclose(
        s_cols * (res.Q - z_cols), res.Wq, rtol=1e-5, atol=1e-5
    )
    # permuted quantization should still beat RTN
    rtn = rtn_quantize(W, bits=4, group_size=64, sym=True)
    err_gptq = np.linalg.norm(X @ (W - res.Wq).T)
    err_rtn = np.linalg.norm(X @ (W - rtn.Wq).T)
    assert err_gptq < err_rtn


def test_dead_columns():
    W, X = _make_problem()
    X[:, 7] = 0.0  # dead input
    H, n = init_hessian(256), jnp.int32(0)
    H, n = accumulate_hessian(H, n, jnp.asarray(X))
    res = gptq_quantize(W, H, bits=4, group_size=128, sym=True, nsamples=int(n))
    assert np.isfinite(res.Wq).all()


def test_damp_ladder_recovers():
    # rank-deficient H: single calibration row
    X = np.ones((1, 64), dtype=np.float32)
    H, n = init_hessian(64), jnp.int32(0)
    H, n = accumulate_hessian(H, n, jnp.asarray(X))
    U, damp = hessian_inverse(H, 0.01, damp_auto_increment=0.05)
    assert np.isfinite(np.asarray(U)).all()
    assert damp >= 0.01


def test_tri_inv_divide_and_conquer():
    """Recursive triangular inverse (n > 1024 path) vs the direct solve."""
    from gptqmodel_tpu.quantization.gptq import _tri_inv_lower

    rng = np.random.default_rng(11)
    n = 1536  # forces one recursion level with a non-power-of-two split
    A = rng.standard_normal((n, 2 * n)).astype(np.float32)
    H = A @ A.T / (2 * n) + 0.1 * np.eye(n, dtype=np.float32)
    L = np.linalg.cholesky(H).astype(np.float32)
    Li = np.asarray(_tri_inv_lower(jnp.asarray(L)))
    # residual check against identity (scale-free)
    resid = Li @ L - np.eye(n, dtype=np.float32)
    assert np.abs(resid).max() < 5e-4, np.abs(resid).max()
    assert np.allclose(np.triu(Li, k=1), 0.0)


def test_nan_loss_guard_falls_back(caplog):
    """Degenerate H (extreme dynamic-range diagonal) + huge W yields inf
    losses on the raw solve; gptq_quantize must detect it, try damp
    escalation, and land on the logged mock-RTN fallback with finite outputs
    (reference gptq.py:1268-1277 NaN-loss handling)."""
    import logging

    rng = np.random.default_rng(0)
    n = 256
    W = (rng.normal(size=(64, n)) * 1e20).astype(np.float32)
    d = np.concatenate([np.full(8, 1e30), np.full(n - 8, 1e-28)])
    H = jnp.asarray(np.diag(d).astype(np.float32))

    # the raw solve really is non-finite (guard has something to catch)
    U, _ = hessian_inverse(H, 0.01)
    raw = gptq_solve_core(jnp.asarray(W), U, bits=4, group_size=128, sym=False)
    assert not np.isfinite(float(jnp.sum(raw["losses"])))

    with caplog.at_level(logging.WARNING, logger="gptqmodel_tpu"):
        res = gptq_quantize(W, H, bits=4, group_size=128, sym=False, nsamples=4)
    assert np.isfinite(res.Wq).all()
    assert np.isfinite(res.scales).all()
    assert np.isfinite(res.avg_loss)
    assert any("non-finite" in r.message for r in caplog.records)


def test_nan_weights_raise():
    """NaN already in W (upstream blow-up) must raise, not write codes."""
    W = np.ones((16, 64), dtype=np.float32)
    W[3, 5] = np.nan
    X = np.random.default_rng(1).normal(size=(32, 64)).astype(np.float32)
    H, n = init_hessian(64), jnp.int32(0)
    H, n = accumulate_hessian(H, n, jnp.asarray(X))
    with pytest.raises(ValueError, match="NaN/inf"):
        gptq_quantize(W, H, bits=4, group_size=64, sym=True, nsamples=int(n))
