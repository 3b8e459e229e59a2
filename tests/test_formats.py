"""Format interop tests: v2 export, desc_act/GAR e2e, dequant export.

Models reference tests/test_format*, test_asym_gptq_v1.py, and the export
path (auto.py:704).
"""

import json
import tempfile
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _fidelity, _make_tiny


def test_v2_format_export_roundtrip():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.quantization.config import FORMAT

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=32, sym=False, format="gptq_v2")
        )
        m.quantize(_calib(8), batch_size=4)
        eval_ids = jnp.asarray(np.stack(_calib(2, 32, seed=5)))
        q_logits = np.asarray(forward_logits(m.spec, m.params, eval_ids))

        out = Path(tmp) / "v2"
        m.save(out)
        qc = json.loads((out / "quantize_config.json").read_text())
        assert qc["checkpoint_format"] == "gptq_v2"
        m2 = GPTQModel.load(out)
        assert m2.qcfg.format == FORMAT.GPTQ_V2
        r_logits = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(r_logits, q_logits, atol=1e-5)


def test_v1_and_v2_exports_equivalent():
    """Same quantization saved as v1 and v2 must load to identical logits."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32, sym=False))
        m.quantize(_calib(8), batch_size=4)
        eval_ids = jnp.asarray(np.stack(_calib(2, 32, seed=6)))

        out1, out2 = Path(tmp) / "v1", Path(tmp) / "v2"
        m.save(out1)
        m.qcfg.format = __import__(
            "gptqmodel_tpu.quantization.config", fromlist=["FORMAT"]
        ).FORMAT.GPTQ_V2
        m.save(out2)
        a = np.asarray(forward_logits(m.spec, GPTQModel.load(out1).params, eval_ids))
        b = np.asarray(forward_logits(m.spec, GPTQModel.load(out2).params, eval_ids))
        np.testing.assert_allclose(a, b, atol=0)


def test_desc_act_e2e():
    """Activation-order quantization end-to-end: solve in perm order, store
    g_idx, reload + XLA g_idx path produces the same logits."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.ops.qlinear import QuantLinear

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32, desc_act=True))
        m.quantize(_calib(12), batch_size=4)
        lp0 = m.params["model"]["layers"][0]
        q = lp0["self_attn"]["q_proj"]
        assert isinstance(q, QuantLinear)
        assert q.g_idx is not None  # non-contiguous groups stored

        eval_ids = jnp.asarray(np.stack(_calib(2, 32, seed=8)))
        ql = np.asarray(forward_logits(m.spec, m.params, eval_ids))
        out = Path(tmp) / "da"
        m.save(out)
        m2 = GPTQModel.load(out)
        rl = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(rl, ql, atol=1e-5)


def test_desc_act_static_groups_contiguous():
    """desc_act + static_groups: the solve runs in activation order but
    groups keep their ORIGINAL membership, so no g_idx indirection is stored
    and the fast kernels stay eligible (the reason static_groups exists)."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.ops.qlinear import QuantLinear

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(
            src,
            QuantizeConfig(bits=4, group_size=32, desc_act=True, static_groups=True),
        )
        m.quantize(_calib(12), batch_size=4)
        q = m.params["model"]["layers"][0]["self_attn"]["q_proj"]
        assert isinstance(q, QuantLinear)
        assert q.g_idx is None  # contiguous despite desc_act

        eval_ids = jnp.asarray(np.stack(_calib(2, 32, seed=9)))
        ql = np.asarray(forward_logits(m.spec, m.params, eval_ids))
        out = Path(tmp) / "dasg"
        m.save(out)
        m2 = GPTQModel.load(out)
        rl = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(rl, ql, atol=1e-5)


def test_gar_keeps_groups_contiguous():
    """act_group_aware reorders within/across groups but composes the perms
    so no g_idx indirection is needed at inference (reference gar.py)."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.ops.qlinear import QuantLinear

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=32, act_group_aware=True)
        )
        m.quantize(_calib(12), batch_size=4)
        q = m.params["model"]["layers"][0]["self_attn"]["q_proj"]
        assert isinstance(q, QuantLinear)


def test_export_dequantized_hf():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.loader import CheckpointReader, build_params_tree
    from gptqmodel_tpu.models.spec import load_hf_config, spec_from_hf_config
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32))
        m.quantize(_calib(8), batch_size=4)
        qdir = Path(tmp) / "q"
        m.save(qdir)
        eval_ids = jnp.asarray(np.stack(_calib(2, 32, seed=4)))
        q_logits = np.asarray(forward_logits(m.spec, m.params, eval_ids))

        dense_dir = Path(tmp) / "dense"
        GPTQModel.export(qdir, dense_dir, dtype="float32")
        cfg = json.loads((dense_dir / "config.json").read_text())
        assert "quantization_config" not in cfg
        spec = spec_from_hf_config(cfg)
        params = build_params_tree(CheckpointReader(dense_dir))
        d_logits = np.asarray(forward_logits(spec, params, eval_ids))
        np.testing.assert_allclose(d_logits, q_logits, rtol=1e-4, atol=2e-4)
