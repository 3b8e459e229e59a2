"""GPTAQ (GPTQ v2 asymmetric-error correction) tests.

Models the reference's gptaq coverage: with a parallel native stream the
corrected solve must track the ORIGINAL model's activations better than
plain GPTQ once earlier-layer quantization has shifted the inputs.
"""

import tempfile

import numpy as np

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _fidelity, _make_tiny


def test_gptaq_zero_dxxt_equals_gptq():
    """With identical streams (dXXT = 0) GPTAQ must reduce to plain GPTQ."""
    from gptqmodel_tpu.quantization.gptq import gptq_quantize

    rng = np.random.default_rng(0)
    W = rng.standard_normal((32, 64)).astype(np.float32) * 0.05
    X = rng.standard_normal((512, 64)).astype(np.float32)
    H = (2.0 / 512) * (X.T @ X)
    a = gptq_quantize(W, H, bits=4, group_size=32, sym=True)
    b = gptq_quantize(
        W, H, bits=4, group_size=32, sym=True,
        dxxt=np.zeros((64, 64), np.float32), gptaq_alpha=0.25,
    )
    np.testing.assert_array_equal(a.Q, b.Q)
    np.testing.assert_allclose(a.scales, b.scales, atol=0)


def test_gptaq_e2e_quality():
    """3-bit deep-ish quantization: GPTAQ correction should beat plain GPTQ
    in fidelity to the fp model (it compensates the input drift the earlier
    quantized layers introduce)."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp, num_hidden_layers=4)
        calib = _calib(24, 64)
        eval_ids = jnp.asarray(np.stack(_calib(4, 64, seed=123)))

        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(forward_logits(fp.spec, fp.params, eval_ids))

        errs = {}
        for name, kw in {
            "gptq": {},
            "gptaq": {"gptaq": {"alpha": 0.25}},
        }.items():
            m = GPTQModel.load(src, QuantizeConfig(bits=3, group_size=32, **kw))
            rows = m.quantize(calib, batch_size=4)
            assert len(rows) == 4 * 7
            ql = np.asarray(forward_logits(m.spec, m.params, eval_ids))
            errs[name] = _fidelity(ql, fp_logits)
        # correction should help (or at minimum not catastrophically hurt)
        assert errs["gptaq"] < errs["gptq"] * 1.05, errs


def test_gptaq_save_reload():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits
    from pathlib import Path

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=32, gptaq={"alpha": 0.3})
        )
        m.quantize(_calib(8), batch_size=4)
        eval_ids = jnp.asarray(np.stack(_calib(2, 32, seed=4)))
        a = np.asarray(forward_logits(m.spec, m.params, eval_ids))
        out = Path(tmp) / "q"
        m.save(out)
        m2 = GPTQModel.load(out)
        assert m2.qcfg.gptaq == {"alpha": 0.3}
        b = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(b, a, atol=1e-5)
