"""ParoQuant (learned pairwise-rotation quantization) tests.

Reference parity target: quantization/paroquant/optimization.py lifecycle —
transform exactness, optimization improving the Hessian-weighted error over
its own step-0 (plain RTN in the identity transform), and checkpoint
round-trip of the runtime transform params.
"""

import tempfile
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _fidelity, _make_tiny


def test_apply_paro_orthogonal_and_inverse():
    from gptqmodel_tpu.quantization.paroquant import apply_paro, paro_pairs

    rng = np.random.default_rng(0)
    h, g, R = 64, 32, 4
    theta = jnp.asarray(rng.uniform(-1, 1, (R, h // 2)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.5, 2.0, (h,)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((5, h)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((7, h)).astype(np.float32))

    # pairs are disjoint per round
    for r in range(R):
        p = paro_pairs(g, R)[r].reshape(-1)
        assert len(set(p.tolist())) == g

    xt = apply_paro(x, theta, s, g)
    wt = apply_paro(w / s[None, :], theta, None, g)
    # dot products preserved: x̃ @ w̃ᵀ == x @ wᵀ
    np.testing.assert_allclose(
        np.asarray(xt @ wt.T), np.asarray(x @ w.T), rtol=1e-4, atol=1e-4
    )
    # exact inverse
    back = apply_paro(xt, theta, s, g, inverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_paroquant_optimize_beats_identity_rtn():
    from gptqmodel_tpu.quantization.paroquant import paroquant_optimize

    rng = np.random.default_rng(1)
    h, out = 128, 64
    # outlier-heavy weights: rotation should spread them and cut the error
    W = rng.standard_normal((out, h)).astype(np.float32) * 0.02
    W[:, rng.choice(h, 6, replace=False)] *= 12.0
    X = rng.standard_normal((512, h)).astype(np.float32)
    H = (2.0 / 512) * (X.T @ X)

    res = paroquant_optimize(
        W, H, bits=4, group_size=32, rot_group=64, rounds=4, steps=48,
        nsamples=512,
    )
    # step-0 loss is identity-transform RTN; best must improve on it
    assert min(res.loss_history) < res.loss_history[0] * 0.9, res.loss_history[:3]
    assert res.theta.shape == (4, h // 2)
    assert res.Q.min() >= 0 and res.Q.max() <= 15


def test_paroquant_e2e_and_reload():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        eval_ids = jnp.asarray(np.stack(_calib(2, 48, seed=13)))
        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(forward_logits(fp.spec, fp.params, eval_ids))

        m = GPTQModel.load(
            src,
            QuantizeConfig(
                method="paroquant", bits=4, group_size=32,
                paroquant={"rounds": 2, "steps": 24, "rot_group": 64},
            ),
        )
        m.quantize(_calib(8), batch_size=4)
        q0 = m.params["model"]["layers"][0]["self_attn"]["q_proj"]
        assert q0.rot_theta is not None and q0.rot_group == 64
        err = _fidelity(
            np.asarray(forward_logits(m.spec, m.params, eval_ids)), fp_logits
        )
        assert err < 0.5, err  # sane 4-bit quality through the transform

        a = np.asarray(forward_logits(m.spec, m.params, eval_ids))
        out = Path(tmp) / "q"
        m.save(out)
        m2 = GPTQModel.load(out)
        q2 = m2.params["model"]["layers"][0]["self_attn"]["q_proj"]
        assert q2.rot_theta is not None and q2.rot_group == 64
        b = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(b, a, atol=2e-5)
