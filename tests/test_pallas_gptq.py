"""Pallas GPTQ block solver vs the XLA fori path (interpret mode on CPU —
same validation pattern as test_pallas_qmatmul)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from gptqmodel_tpu.ops.pallas_gptq import gptq_block_inner, solver_row_tile
from gptqmodel_tpu.quantization.gptq import gptq_quantize


def _case(out_f=64, in_f=256, seed=0):
    rng = np.random.default_rng(seed)
    W = (rng.standard_normal((out_f, in_f)) * 0.05).astype(np.float32)
    X = rng.standard_normal((512, in_f)).astype(np.float32)
    H = (2.0 / 512) * (X.T @ X)
    return W, H


@pytest.mark.parametrize("sym", [True, False])
@pytest.mark.parametrize("g", [64, 256, -1])
def test_solver_matches_xla_path(sym, g):
    W, H = _case()
    os.environ["GPTQ_TPU_SOLVER"] = "xla"
    try:
        ref = gptq_quantize(W, H, bits=4, group_size=g, sym=sym, nsamples=512)
    finally:
        os.environ["GPTQ_TPU_SOLVER"] = "pallas_interpret"
    try:
        got = gptq_quantize(W, H, bits=4, group_size=g, sym=sym, nsamples=512)
    finally:
        os.environ.pop("GPTQ_TPU_SOLVER", None)

    np.testing.assert_array_equal(got.Q, ref.Q)
    np.testing.assert_allclose(got.Wq, ref.Wq, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got.scales, ref.scales, rtol=1e-7)
    np.testing.assert_allclose(got.avg_loss, ref.avg_loss, rtol=1e-5)


@pytest.mark.parametrize("sym", [True, False])
@pytest.mark.parametrize("g", [64, 128, 256, -1])
def test_mega_solver_matches_xla_path(sym, g):
    """Whole-solve mega-kernel (interpret) vs the XLA scan path."""
    W, H = _case(out_f=64, in_f=256)
    os.environ["GPTQ_TPU_SOLVER"] = "xla"
    try:
        ref = gptq_quantize(W, H, bits=4, group_size=g, sym=sym, nsamples=512)
    finally:
        os.environ["GPTQ_TPU_SOLVER"] = "mega_interpret"
    try:
        got = gptq_quantize(W, H, bits=4, group_size=g, sym=sym, nsamples=512)
    finally:
        os.environ.pop("GPTQ_TPU_SOLVER", None)

    frac = float((got.Q != ref.Q).mean())
    assert frac < 2e-3, f"code mismatch fraction {frac}"
    np.testing.assert_allclose(got.Wq, ref.Wq, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(got.scales, ref.scales, rtol=1e-5)
    np.testing.assert_allclose(got.avg_loss, ref.avg_loss, rtol=1e-3)


@pytest.mark.parametrize(
    "kw",
    [
        dict(desc_act=True),
        dict(static_groups=True),
        dict(desc_act=True, static_groups=True),
        dict(bits=3),
    ],
)
def test_mega_solver_variants(kw):
    W, H = _case(out_f=32, in_f=512, seed=7)
    base = dict(bits=4, group_size=128, sym=False, nsamples=512)
    base.update(kw)
    os.environ["GPTQ_TPU_SOLVER"] = "xla"
    try:
        ref = gptq_quantize(W, H, **base)
    finally:
        os.environ["GPTQ_TPU_SOLVER"] = "mega_interpret"
    try:
        got = gptq_quantize(W, H, **base)
    finally:
        os.environ.pop("GPTQ_TPU_SOLVER", None)
    frac = float((got.Q != ref.Q).mean())
    assert frac < 2e-3, f"code mismatch fraction {frac}"
    np.testing.assert_allclose(got.Wq, ref.Wq, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(got.scales, ref.scales, rtol=1e-5)
    np.testing.assert_array_equal(got.g_idx, ref.g_idx)


def test_mega_solver_padded_in_features():
    """in_f not a multiple of the blocksize goes through the pad path."""
    W, H = _case(out_f=32, in_f=320, seed=5)
    os.environ["GPTQ_TPU_SOLVER"] = "xla"
    try:
        ref = gptq_quantize(W, H, bits=4, group_size=64, sym=True, nsamples=512)
    finally:
        os.environ["GPTQ_TPU_SOLVER"] = "mega_interpret"
    try:
        got = gptq_quantize(W, H, bits=4, group_size=64, sym=True, nsamples=512)
    finally:
        os.environ.pop("GPTQ_TPU_SOLVER", None)
    frac = float((got.Q != ref.Q).mean())
    assert frac < 2e-3, f"code mismatch fraction {frac}"
    np.testing.assert_allclose(got.Wq, ref.Wq, rtol=1e-4, atol=2e-4)


def test_block_inner_direct():
    """Kernel-level check: identical outputs to a hand-rolled column loop."""
    rng = np.random.default_rng(3)
    out_f, B = 32, 128
    maxq = 15
    Wb = (rng.standard_normal((out_f, B)) * 0.05).astype(np.float32)
    A = rng.standard_normal((B, 2 * B)).astype(np.float32)
    Hbb = np.triu((A @ A.T / (2 * B) + 0.1 * np.eye(B)).astype(np.float32))
    S = rng.uniform(0.005, 0.02, size=(out_f, B)).astype(np.float32)
    Z = np.full((out_f, B), 8.0, np.float32)

    Q, Dq, E, L = gptq_block_inner(
        jnp.asarray(Wb), jnp.asarray(Hbb), jnp.asarray(S), jnp.asarray(Z),
        maxq=maxq, rt=solver_row_tile(out_f), interpret=True,
    )

    Wc = Wb.copy()
    Qr = np.zeros_like(Wb); Dqr = np.zeros_like(Wb)
    Er = np.zeros_like(Wb); Lr = np.zeros_like(Wb)
    for i in range(B):
        w = Wc[:, i]
        d = Hbb[i, i]
        q = np.clip(np.round(w / S[:, i]) + Z[:, i], 0, maxq)
        dq = S[:, i] * (q - Z[:, i])
        err = (w - dq) / d
        Lr[:, i] = 0.5 * (w - dq) ** 2 / d**2
        Qr[:, i] = q; Dqr[:, i] = dq; Er[:, i] = err
        Wc[:, i + 1 :] -= err[:, None] * Hbb[i, i + 1 :][None, :]

    np.testing.assert_allclose(np.asarray(Q), Qr, atol=0)
    np.testing.assert_allclose(np.asarray(Dq), Dqr, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(E), Er, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(L), Lr, rtol=1e-5, atol=1e-9)


def test_mega_solver_small_group_falls_back():
    """group_size with B//g > 8 param rows must fall back to the XLA scan
    (the kernel's gp_pad=8 sublane block can't hold them) instead of
    tripping gptq_whole_solve's assert at trace time."""
    W, H = _case(out_f=32, in_f=256, seed=9)
    os.environ["GPTQ_TPU_SOLVER"] = "xla"
    try:
        ref = gptq_quantize(W, H, bits=4, group_size=8, sym=True, nsamples=512)
    finally:
        os.environ["GPTQ_TPU_SOLVER"] = "mega_interpret"
    try:
        got = gptq_quantize(W, H, bits=4, group_size=8, sym=True, nsamples=512)
    finally:
        os.environ.pop("GPTQ_TPU_SOLVER", None)
    np.testing.assert_array_equal(got.Q, ref.Q)
    np.testing.assert_allclose(got.Wq, ref.Wq, rtol=1e-6, atol=1e-7)
