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


# --------------------------------------------------------------------------
# FP4 (e2m1)
# --------------------------------------------------------------------------


def test_fp4_grid_roundtrip():
    """Values exactly on the e2m1 grid must survive quantization exactly."""
    import numpy as np

    from gptqmodel_tpu.ops.fp8 import F4_GRID, dequantize_fp4, quantize_fp4

    grid = np.concatenate([F4_GRID, -F4_GRID[1:]])
    rng = np.random.default_rng(0)
    W = rng.choice(grid, size=(8, 64)).astype(np.float32)
    W[:, 0] = 6.0  # pin the group absmax so scales are exactly 1
    p = quantize_fp4(W, group_size=64)
    back = np.asarray(dequantize_fp4(p)).T
    np.testing.assert_allclose(back, W, atol=1e-6)


def test_fp4_error_bounded_and_forward():
    import numpy as np

    import jax.numpy as jnp

    from gptqmodel_tpu.ops.fp8 import dequantize_fp4, fp4_forward, quantize_fp4

    rng = np.random.default_rng(1)
    W = rng.standard_normal((32, 128)).astype(np.float32) * 0.1
    p = quantize_fp4(W, group_size=32)
    back = np.asarray(dequantize_fp4(p)).T
    rel = np.linalg.norm(back - W) / np.linalg.norm(W)
    assert rel < 0.25, rel  # 4-bit float grid error
    x = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
    y = np.asarray(fp4_forward(p, x))
    ref = np.asarray(x) @ back.T
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_fp4_weight_only_e2e():
    import tempfile
    from pathlib import Path

    import numpy as np

    import jax.numpy as jnp

    from tests.test_e2e_quantize import _calib, _make_tiny
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.ops.fp8 import Fp4Linear

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(src, QuantizeConfig(method="fp4", group_size=32))
        rows = m.quantize()  # calibration-free
        assert rows
        q0 = m.params["model"]["layers"][0]["self_attn"]["q_proj"]
        assert isinstance(q0, Fp4Linear)
        eval_ids = jnp.asarray(np.stack(_calib(2, 32, seed=6)))
        a = np.asarray(forward_logits(m.spec, m.params, eval_ids))
        out = Path(tmp) / "q"
        m.save(out)
        m2 = GPTQModel.load(out)
        assert isinstance(
            m2.params["model"]["layers"][0]["self_attn"]["q_proj"], Fp4Linear
        )
        b = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(b, a, atol=1e-5)
