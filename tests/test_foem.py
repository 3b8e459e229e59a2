"""FOEM (first-order error compensation) tests.

Models the reference's FOEM coverage (quantization/foem.py): β damps the
fed-back error toward the raw weights; α>0 composes the GPTAQ P-term on the
same native stream. β=0, α=0 must reduce exactly to plain GPTQ.
"""

import tempfile

import numpy as np

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _fidelity, _make_tiny


def test_foem_beta_zero_equals_gptq():
    from gptqmodel_tpu.quantization.gptq import gptq_quantize

    rng = np.random.default_rng(0)
    W = rng.standard_normal((32, 64)).astype(np.float32) * 0.05
    X = rng.standard_normal((512, 64)).astype(np.float32)
    H = (2.0 / 512) * (X.T @ X)
    a = gptq_quantize(W, H, bits=4, group_size=32, sym=True)
    b = gptq_quantize(W, H, bits=4, group_size=32, sym=True, foem_beta=0.0)
    np.testing.assert_array_equal(a.Q, b.Q)


def test_foem_beta_changes_solution_sanely():
    """β>0 yields a different (valid) solution whose Hessian-weighted error
    stays in the same ballpark as GPTQ — FOEM trades proxy loss for
    robustness, so we bound rather than compare strictly."""
    from gptqmodel_tpu.quantization.gptq import gptq_quantize

    rng = np.random.default_rng(1)
    W = rng.standard_normal((48, 128)).astype(np.float32) * 0.1
    X = rng.standard_normal((1024, 128)).astype(np.float32)
    H = (2.0 / 1024) * (X.T @ X)

    base = gptq_quantize(W, H, bits=4, group_size=32, sym=True)
    foem = gptq_quantize(W, H, bits=4, group_size=32, sym=True, foem_beta=0.2)
    assert not np.array_equal(base.Q, foem.Q)

    def h_err(Wq):
        D = Wq - W
        return float(np.einsum("oi,ij,oj->", D, H, D))

    assert h_err(foem.Wq) < h_err(base.Wq) * 2.0
    # codes stay in range
    assert foem.Q.min() >= 0 and foem.Q.max() <= 15


def test_foem_e2e_and_reload():
    """End-to-end FOEM (β only) and FOEM+GPTAQ (α>0 uses the native stream):
    both must quantize, keep fidelity comparable to GPTQ, and round-trip."""
    from pathlib import Path

    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp, num_hidden_layers=3)
        calib = _calib(16, 64)
        eval_ids = jnp.asarray(np.stack(_calib(4, 64, seed=123)))

        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(forward_logits(fp.spec, fp.params, eval_ids))

        errs = {}
        for name, kw in {
            "gptq": {},
            "foem": {"foem": {"beta": 0.2}},
            "foem_gptaq": {"foem": {"alpha": 0.25, "beta": 0.2}},
        }.items():
            m = GPTQModel.load(src, QuantizeConfig(bits=3, group_size=32, **kw))
            rows = m.quantize(calib, batch_size=4)
            assert len(rows) == 3 * 7
            ql = np.asarray(forward_logits(m.spec, m.params, eval_ids))
            errs[name] = _fidelity(ql, fp_logits)
        # compensation must not blow up quality on a well-behaved model
        assert errs["foem"] < errs["gptq"] * 1.5, errs
        assert errs["foem_gptaq"] < errs["gptq"] * 1.5, errs

        m = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=32, foem={"beta": 0.15})
        )
        m.quantize(_calib(8), batch_size=4)
        a = np.asarray(forward_logits(m.spec, m.params, eval_ids))
        out = Path(tmp) / "q"
        m.save(out)
        m2 = GPTQModel.load(out)
        assert m2.qcfg.foem == {"beta": 0.15}
        b = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(b, a, atol=1e-5)
