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


def _ragged_case(model_type, **over):
    """Stacked ragged MoE dispatch must match the dense expert loop."""
    from gptqmodel_tpu.models.optimize import stack_moe_experts
    from gptqmodel_tpu.models.transformer import forward_logits
    from tests.test_transformer import _jax_logits, _tiny_llama_dir

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(tmp, model_type, **over)
        spec, params, ids, dense = _jax_logits(d)
        stack_moe_experts(spec, params)
        lp = params["model"]["layers"][-1]
        mp = lp.get("block_sparse_moe") or lp["mlp"]
        assert "experts_stacked" in mp and "experts" not in mp
        ragged = np.asarray(forward_logits(spec, params, jnp.asarray(ids),
                                           dtype=jnp.float32))
        np.testing.assert_allclose(ragged, dense, rtol=1e-5, atol=2e-5)


def test_ragged_moe_qwen3():
    _ragged_case(
        "qwen3_moe", num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, decoder_sparse_step=1, norm_topk_prob=True,
        head_dim=16, mlp_only_layers=[],
    )


def test_ragged_moe_mixtral():
    _ragged_case("mixtral", num_local_experts=4, num_experts_per_tok=2)


def test_ragged_moe_deepseek():
    from tests.test_transformer import _DSV2_TINY

    _ragged_case(
        "deepseek_v2", q_lora_rank=None, topk_method="greedy", **_DSV2_TINY
    )


def test_save_after_stacked_optimize_roundtrips():
    """save() after optimize() stacked the experts must export per-expert
    interchange tensors (runtime stacked forms never leak) and reload to the
    same generations. Round-2 fix: this used to crash with dtype=object."""
    import tempfile

    import numpy as np

    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.ops import registry
    from tests.test_e2e_quantize import _calib, _make_tiny

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(
            tmp, "qwen3_moe", hidden_size=128, intermediate_size=256,
            num_attention_heads=4, num_key_value_heads=2, num_experts=4,
            num_experts_per_tok=2, moe_intermediate_size=128,
            decoder_sparse_step=1, norm_topk_prob=True, head_dim=32,
            mlp_only_layers=[], num_hidden_layers=1,
        )
        m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32))
        m.quantize(_calib(8, 32), batch_size=4)
        m.save(tmp + "/q")
        base = GPTQModel.load(tmp + "/q")
        ids = np.arange(1, 7).reshape(1, 6)
        out0 = np.asarray(base.generate(ids, max_new_tokens=3))

        registry.set_backend("pallas_interpret")
        try:
            m2 = GPTQModel.load(tmp + "/q")
            m2._load_params()
            m2.optimize()
            mlp = m2.params["model"]["layers"][0]["mlp"]
            assert "experts_stacked_q" in mlp and "gateup" in mlp["experts_stacked_q"]
            m2.save(tmp + "/q2")
            m3 = GPTQModel.load(tmp + "/q2")
            out3 = np.asarray(m3.generate(ids, max_new_tokens=3))
        finally:
            registry.set_backend("auto")
        np.testing.assert_array_equal(out0, out3)
