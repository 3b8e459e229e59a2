"""Projection-fusion optimization: fused model must match unfused logits."""

import tempfile

import numpy as np

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _make_tiny


def test_fuse_projections_preserves_logits():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.optimize import fuse_projections
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.ops.qlinear import QuantLinear

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32))
        m.quantize(_calib(8), batch_size=4)
        ids = jnp.asarray(np.stack(_calib(2, 32, seed=5)))
        before = np.asarray(forward_logits(m.spec, m.params, ids))

        fuse_projections(m.spec, m.params)
        lp0 = m.params["model"]["layers"][0]
        assert isinstance(lp0["self_attn"]["qkv_proj"], QuantLinear)
        assert "q_proj" not in lp0["self_attn"]
        assert isinstance(lp0["mlp"]["gate_up_proj"], QuantLinear)
        after = np.asarray(forward_logits(m.spec, m.params, ids))
        np.testing.assert_allclose(after, before, rtol=1e-5, atol=1e-5)
