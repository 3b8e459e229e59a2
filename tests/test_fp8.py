"""FP8 weight-only quantization tests (reference fp8.py / dtype.py analog)."""

import tempfile
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _fidelity, _make_tiny


def test_fp8_quantize_dequantize_accuracy():
    from gptqmodel_tpu.ops.fp8 import dequantize_fp8, quantize_fp8

    rng = np.random.default_rng(0)
    W = rng.standard_normal((64, 128)).astype(np.float32) * 0.05
    p = quantize_fp8(W)
    assert p.weight_u8.dtype == np.uint8
    back = np.asarray(dequantize_fp8(p))
    rel = np.linalg.norm(back - W) / np.linalg.norm(W)
    assert rel < 0.04, rel  # e4m3: ~2-3% relative rounding


def test_fp8_weight_only_e2e():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.ops.fp8 import Fp8Linear

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        eval_ids = jnp.asarray(np.stack(_calib(3, 40, seed=5)))
        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(forward_logits(fp.spec, fp.params, eval_ids))

        m = GPTQModel.load(src, QuantizeConfig(method="fp8"))
        rows = m.quantize()  # calibration-free
        assert len(rows) == 14
        lp0 = m.params["model"]["layers"][0]
        assert isinstance(lp0["self_attn"]["q_proj"], Fp8Linear)
        q_logits = np.asarray(forward_logits(m.spec, m.params, eval_ids))
        err = _fidelity(q_logits, fp_logits)
        assert err < 0.1, err  # 8-bit float: small divergence

        out = Path(tmp) / "fp8"
        m.save(out)
        m2 = GPTQModel.load(out)
        assert isinstance(
            m2.params["model"]["layers"][0]["mlp"]["down_proj"], Fp8Linear
        )
        r_logits = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(r_logits, q_logits, atol=1e-5)


def test_gptq_needs_calibration_error():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(src, QuantizeConfig())
        try:
            m.quantize()
            assert False, "should have raised"
        except ValueError as e:
            assert "calibration" in str(e)


def test_rtn_weight_only_fast_path():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.ops.qlinear import QuantLinear

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(src, QuantizeConfig(method="rtn", bits=4, group_size=32))
        rows = m.quantize()  # no calibration
        assert len(rows) == 14
        assert all(r["samples"] == 0 for r in rows)
        assert isinstance(
            m.params["model"]["layers"][1]["mlp"]["up_proj"], QuantLinear
        )
