"""QQQ (W4A8) method tests.

Reference parity target: quantization/qqq.py + the marlin-qqq W4A8 runtime —
here: GPTQ solve with forced symmetry, and a dynamic-int8-activation
int8×int8 matmul path (qlinear_forward_a8) whose only extra error vs the
dequant path is the activation quantization (~1%).
"""

import tempfile
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _make_tiny


def test_a8_forward_matches_dequant_path():
    from gptqmodel_tpu.ops import registry
    from gptqmodel_tpu.ops.qlinear import (
        make_quant_linear,
        qlinear_forward_a8,
        qlinear_forward_xla,
    )

    rng = np.random.default_rng(0)
    bits, g, K, N = 4, 64, 256, 128
    codes = rng.integers(0, 16, size=(N, K), dtype=np.int64)
    scales = rng.uniform(0.005, 0.05, size=(K // g, N)).astype(np.float16)
    zeros = np.full((K // g, N), 8, np.int64)  # symmetric
    p = make_quant_linear(Q=codes, scales=scales, zeros=zeros, g_idx=None,
                          bias=None, bits=bits, group_size=g, sym=True, a8=True)
    p = registry.post_init_module(p)
    x = jnp.asarray(rng.standard_normal((48, K)), jnp.float32)
    ref = np.asarray(qlinear_forward_xla(p, x))
    got = np.asarray(qlinear_forward_a8(p, x))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel  # int8 activation quantization error only

    # registry routes a8 modules to the int8 path at prefill sizes
    via = np.asarray(registry.qlinear_forward(p, x))
    np.testing.assert_array_equal(via, got)
    # ... but not at decode sizes (weight-streaming path)
    y1 = np.asarray(registry.qlinear_forward(p, x[:2]))
    assert np.linalg.norm(y1 - ref[:2]) / np.linalg.norm(ref[:2]) < 1e-6


def test_qqq_config_validation():
    from gptqmodel_tpu.quantization.config import METHOD, QuantizeConfig

    cfg = QuantizeConfig(method="qqq", bits=4, sym=False)
    assert cfg.sym is True  # forced
    assert cfg.method == METHOD.QQQ
    with pytest.raises(ValueError, match="QQQ requires bits=4"):
        QuantizeConfig(method="qqq", bits=8)


def test_qqq_e2e_quantize_save_reload():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(src, QuantizeConfig(method="qqq", group_size=32))
        m.quantize(_calib(8), batch_size=4)
        q0 = m.params["model"]["layers"][0]["self_attn"]["q_proj"]
        assert q0.a8 and q0.sym

        eval_ids = jnp.asarray(np.stack(_calib(2, 48, seed=5)))  # T=48 > 32: a8 path
        a = np.asarray(forward_logits(m.spec, m.params, eval_ids))
        out = Path(tmp) / "q"
        m.save(out)
        import json

        cfg = json.loads((out / "quantize_config.json").read_text())
        assert cfg["quant_method"] == "qqq"
        m2 = GPTQModel.load(out)
        assert m2.params["model"]["layers"][0]["self_attn"]["q_proj"].a8
        b = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(b, a, atol=1e-5)
