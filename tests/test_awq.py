"""AWQ end-to-end + search-function unit tests.

Models reference AWQ coverage (tests/models quant tests with METHOD.AWQ,
awq_processor scale/clip search): scale search must beat plain RTN on the
calibration distribution, folds must preserve the fp model's function, and
the quantized checkpoint must roundtrip.
"""

import tempfile
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _fidelity, _make_tiny


def test_search_scale_improves_hessian_loss():
    from gptqmodel_tpu.looper.awq import _rtn_dq, search_scale

    rng = np.random.default_rng(0)
    out_f, in_f = 64, 128
    W = jnp.asarray(rng.standard_normal((out_f, in_f)) * 0.05, jnp.float32)
    # skewed activations: a few loud channels (the case AWQ exists for)
    mag = np.ones(in_f); mag[:8] = 20.0
    X = rng.standard_normal((2048, in_f)) * mag
    G = jnp.asarray(X.T @ X, jnp.float32)
    xmean = jnp.asarray(np.abs(X).mean(0), jnp.float32)

    s, best = search_scale(W, G, xmean, bits=3, group_size=32, sym=False)
    base_dq = _rtn_dq(W, 3, 32, False)
    base_loss = float(jnp.einsum("oi,ij,oj->", base_dq - W, G, base_dq - W))
    scaled_dq = _rtn_dq(W * s[None, :], 3, 32, False) / s[None, :]
    scaled_loss = float(jnp.einsum("oi,ij,oj->", scaled_dq - W, G, scaled_dq - W))
    assert scaled_loss <= base_loss
    assert float(best) == pytest.approx(scaled_loss, rel=1e-4)


def test_search_clip_never_hurts():
    from gptqmodel_tpu.looper.awq import _rtn_dq, search_clip

    rng = np.random.default_rng(1)
    W = rng.standard_normal((32, 64)).astype(np.float32) * 0.05
    W[0, 0] = 2.0  # outlier that wrecks its group's range
    X = rng.standard_normal((512, 64)).astype(np.float32)
    G = jnp.asarray(X.T @ X)
    Wc = np.asarray(search_clip(jnp.asarray(W), G, bits=4, group_size=32, sym=False))
    dq_c = _rtn_dq(jnp.asarray(Wc), 4, 32, False)
    dq_0 = _rtn_dq(jnp.asarray(W), 4, 32, False)
    loss_c = float(jnp.einsum("oi,ij,oj->", dq_c - W, G, dq_c - W))
    loss_0 = float(jnp.einsum("oi,ij,oj->", dq_0 - W, G, dq_0 - W))
    assert loss_c <= loss_0 + 1e-6


def test_awq_e2e_quantize_and_roundtrip():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        calib = _calib(16, 64)
        eval_ids = np.stack(_calib(4, 48, seed=7))

        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(forward_logits(fp.spec, fp.params, jnp.asarray(eval_ids)))

        m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32, sym=False, method="awq"))
        rows = m.quantize(calib, batch_size=4)
        assert len(rows) == 2 * 7
        q_logits = np.asarray(forward_logits(m.spec, m.params, jnp.asarray(eval_ids)))
        err = _fidelity(q_logits, fp_logits)
        assert err < 0.5, err

        out = Path(tmp) / "awq_q"
        m.save(out)
        m2 = GPTQModel.load(out)
        assert m2.qcfg.method.value == "awq"
        r_logits = np.asarray(forward_logits(m2.spec, m2.params, jnp.asarray(eval_ids)))
        np.testing.assert_allclose(r_logits, q_logits, rtol=1e-4, atol=1e-4)


def test_awq_beats_rtn_with_outlier_channels():
    """On a model whose activations have loud channels, AWQ must beat RTN
    (the method's core claim; reference quality-floor analog)."""
    import torch
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        # amplify some embedding channels -> loud activation channels
        import safetensors.numpy as stn

        f = Path(src) / "model.safetensors"
        tensors = stn.load_file(f)
        emb = tensors["model.embed_tokens.weight"]
        emb[:, :8] *= 12.0
        tensors["model.embed_tokens.weight"] = emb
        stn.save_file(tensors, f, metadata={"format": "pt"})

        calib = _calib(24, 64)
        eval_ids = np.stack(_calib(4, 64, seed=9))
        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(forward_logits(fp.spec, fp.params, jnp.asarray(eval_ids)))

        errs = {}
        for name, kw in {
            "awq": dict(method="awq", sym=False),
            "rtn": dict(method="rtn", sym=False),
        }.items():
            m = GPTQModel.load(src, QuantizeConfig(bits=3, group_size=32, **kw))
            m.quantize(calib, batch_size=4)
            ql = np.asarray(forward_logits(m.spec, m.params, jnp.asarray(eval_ids)))
            errs[name] = _fidelity(ql, fp_logits)
        assert errs["awq"] < errs["rtn"], errs
