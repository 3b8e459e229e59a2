"""JAX forward parity vs HF torch modeling code on tiny random models.

This is the executable-reference anchor for the model layer (the analog of
the reference validating fast kernels against TorchLinear, SURVEY §4): our
functional forward must reproduce transformers' logits on the same random
checkpoint before any quantization claims mean anything.
"""

import json
import tempfile
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp


def _tiny_llama_dir(tmp, model_type="llama", **over):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    base = dict(
        model_type=model_type,
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    base.update(over)
    cfg = AutoConfig.for_model(**base)
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
    d = Path(tmp) / model_type
    model.save_pretrained(d, safe_serialization=True)
    return d, model


def _jax_logits(model_dir):
    from gptqmodel_tpu.models.definitions import get_model_def
    from gptqmodel_tpu.models.loader import CheckpointReader, build_params_tree
    from gptqmodel_tpu.models.spec import load_hf_config, spec_from_hf_config
    from gptqmodel_tpu.models.transformer import forward_logits

    hf_cfg = load_hf_config(model_dir)
    spec = spec_from_hf_config(hf_cfg)
    reader = CheckpointReader(model_dir)
    mdef = get_model_def(spec.model_type, tensor_names=reader.names())
    params = build_params_tree(
        mdef.wrap_reader(reader, hf_cfg),
        conv1d_suffixes=mdef.conv1d_suffixes,
        layer_container=mdef.layers_container,
    )
    ids = np.arange(24).reshape(2, 12) % spec.vocab_size
    logits = forward_logits(spec, params, jnp.asarray(ids), dtype=jnp.float32)
    return spec, params, ids, np.asarray(logits)


def _torch_logits(model, ids):
    import torch

    with torch.no_grad():
        out = model(torch.tensor(ids)).logits
    return out.numpy()


@pytest.mark.parametrize(
    "model_type,over",
    [
        ("llama", {}),
        ("qwen3", {"head_dim": 16}),
        ("mistral", {"sliding_window": None}),
    ],
)
def test_forward_parity_dense(model_type, over):
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(tmp, model_type, **over)
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-4)


def test_forward_parity_phi3_fused_projections():
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "phi3",
            intermediate_size=96,  # phi3 fuses gate+up: any size works
            pad_token_id=0,  # phi3 default pad id exceeds tiny vocab
        )
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-4)


def test_forward_parity_opt():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="opt",
            vocab_size=128,
            hidden_size=64,
            ffn_dim=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=128,
            word_embed_proj_dim=64,
            do_layer_norm_before=True,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "opt"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.family == "opt"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-4)


def test_opt_quantize_e2e():
    """OPT end-to-end through its own module tree (model.decoder.layers)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="opt", vocab_size=128, hidden_size=64, ffn_dim=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=128, word_embed_proj_dim=64,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval().save_pretrained(
            Path(tmp) / "opt", safe_serialization=True
        )
        m = GPTQModel.load(Path(tmp) / "opt", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 6  # q/k/v/out_proj/fc1/fc2 per layer
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert out.shape == (1, 4)


def test_forward_parity_qwen3_moe():
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp,
            "qwen3_moe",
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            decoder_sparse_step=1,
            norm_topk_prob=True,
            head_dim=16,
            mlp_only_layers=[],
        )
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_qwen2_moe():
    """qwen2_moe: sigmoid-gated shared expert on top of top-k routing,
    norm_topk_prob=False, qkv bias."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "qwen2_moe",
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
            shared_expert_intermediate_size=64, decoder_sparse_step=1,
            norm_topk_prob=False, mlp_only_layers=[],
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.attention_bias and not spec.norm_topk_prob
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-3)


def test_qwen2_moe_quantize_e2e():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(
            tmp, "qwen2_moe",
            num_experts=2, num_experts_per_tok=1, moe_intermediate_size=32,
            shared_expert_intermediate_size=64, decoder_sparse_step=1,
            norm_topk_prob=False, mlp_only_layers=[],
        )
        rng = np.random.default_rng(0)
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # 4 attn + 2 experts x 3 + shared_expert x 3 per layer
        assert len(rows) == 2 * (4 + 2 * 3 + 3), len(rows)
        mods = {r["module"] for r in rows}
        assert "mlp.shared_expert.up_proj" in mods
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert gen.shape == (1, 4)


def test_forward_parity_gemma2():
    """gemma2 flags: softcaps, pre/post-FFN norms, rms offset, query scale.
    (Sliding-window alternation not exercised: T << window.)"""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "gemma2",
            head_dim=16, query_pre_attn_scalar=16,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            sliding_window=4096,
        )
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-4)


def test_forward_parity_mixtral():
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "mixtral",
            num_local_experts=4, num_experts_per_tok=2,
        )
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_mixtral_quantize_e2e():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(
            tmp, "mixtral", num_local_experts=2, num_experts_per_tok=1,
        )
        rng = np.random.default_rng(0)
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # 4 attn + 2 experts x 3 per layer
        assert len(rows) == 2 * (4 + 2 * 3), len(rows)
        mods = {r["module"] for r in rows}
        assert "block_sparse_moe.experts.0.w1" in mods
        assert "block_sparse_moe.experts.1.w2" in mods


def test_forward_parity_gemma3():
    """gemma3: sliding/full alternation with SEPARATE rope bases per layer
    kind, qk-norm with (1+w) offset, gemma2-style pre/post norms. The tiny
    window (8 < T=12) makes the sliding mask + local rope load-bearing."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "gemma3_text",
            head_dim=16, query_pre_attn_scalar=16,
            sliding_window=8,
            layer_types=["sliding_attention", "full_attention"],
            rope_local_base_freq=10000.0, rope_theta=1000000.0,
            rope_scaling={"rope_type": "linear", "factor": 8.0},
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.rope_local_theta == 10000.0
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_gemma3_quantize_generate_e2e():
    """gemma3 through quantize + KV-cache decode: sliding layers must use
    the windowed mask and local rope in BOTH prefill and decode; generation
    from the cache path must match full re-forward argmax."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(
            tmp, "gemma3_text",
            head_dim=16, query_pre_attn_scalar=16,
            sliding_window=8,
            layer_types=["sliding_attention", "full_attention"],
            rope_local_base_freq=10000.0, rope_theta=1000000.0,
        )
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 7
        # cache decode vs full forward: greedy continuation must agree
        prompt = np.asarray([[3, 5, 7, 9, 11, 13]], np.int32)
        gen = m.generate(prompt, max_new_tokens=8, dtype=jnp.float32)
        seq = prompt.copy()
        for _ in range(8):
            lg = np.asarray(forward_logits(m.spec, m.params, jnp.asarray(seq)))
            nxt = int(np.argmax(lg[0, -1]))
            seq = np.concatenate([seq, [[nxt]]], axis=1)
        np.testing.assert_array_equal(gen[0], seq[0, 6:])


_DSV2_TINY = dict(
    vocab_size=128, hidden_size=64, intermediate_size=96,
    moe_intermediate_size=32, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=4, kv_lora_rank=16, qk_rope_head_dim=8,
    qk_nope_head_dim=8, v_head_dim=8, head_dim=8, n_routed_experts=4,
    n_shared_experts=1, num_experts_per_tok=2, first_k_dense_replace=1,
    max_position_embeddings=256, tie_word_embeddings=False,
)


def test_forward_parity_deepseek_v2_mla_dense():
    """MLA attention parity in isolation (all layers dense via
    first_k_dense_replace): strict tolerance — rope slice, kv compression,
    separate v_head_dim must match HF exactly."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "deepseek_v2", q_lora_rank=None, topk_method="greedy",
            **dict(_DSV2_TINY, first_k_dense_replace=2),
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.mla and spec.head_dim == 16
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_deepseek_v2_lite():
    """deepseek_v2 lite-style: MLA without q compression (q_proj), shared
    experts, first layer dense, greedy softmax routing. Tolerance is looser:
    tiny random gates have near-tie top-k margins (~1e-3), and a single
    routing flip between frameworks moves a few logits by ~1e-3 — both
    selections are valid."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "deepseek_v2", q_lora_rank=None, topk_method="greedy",
            **_DSV2_TINY,
        )
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-3)


def test_forward_parity_deepseek_v2_full_yarn():
    """deepseek_v2 full-style: q_a/q_b low-rank query, group-limited routing,
    YaRN rope scaling with deepseek mscale factors."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "deepseek_v2", q_lora_rank=24,
            topk_method="group_limited_greedy", n_group=2, topk_group=1,
            routed_scaling_factor=2.0,
            rope_scaling={
                "rope_type": "yarn", "factor": 4.0, "mscale": 0.707,
                "mscale_all_dim": 0.707,
                "original_max_position_embeddings": 64,
                "beta_fast": 32, "beta_slow": 1,
            },
            **_DSV2_TINY,
        )
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-3)


def test_forward_parity_deepseek_v3():
    """deepseek_v3: sigmoid scoring + noaux_tc group routing with
    e_score_correction_bias, norm_topk_prob."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "deepseek_v3", q_lora_rank=24, n_group=2, topk_group=1,
            norm_topk_prob=True, routed_scaling_factor=2.5,
            **_DSV2_TINY,
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.moe_scoring == "sigmoid"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-3)


def test_deepseek_quantize_generate_e2e():
    """deepseek_v2 lite end-to-end: quantize through the MLA tree (optional
    modules skipped per layer), reload, KV-cache decode matches re-forward."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(
            tmp, "deepseek_v2", q_lora_rank=None, topk_method="greedy",
            **_DSV2_TINY,
        )
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=16))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # layer0 (dense): q,kv_a,kv_b,o + gate/up/down = 7
        # layer1 (moe): 4 attn + 4 experts*3 + shared*3 = 19
        assert len(rows) == 7 + 19, len(rows)
        mods = {r["module"] for r in rows}
        assert "mlp.gate_proj" in mods  # dense layer-0 mlp
        assert "mlp.experts.3.down_proj" in mods
        assert "mlp.shared_experts.up_proj" in mods
        prompt = np.asarray([[3, 5, 7, 9, 11, 13]], np.int32)
        gen = m.generate(prompt, max_new_tokens=6, dtype=jnp.float32)
        seq = prompt.copy()
        for _ in range(6):
            lg = np.asarray(forward_logits(m.spec, m.params, jnp.asarray(seq)))
            seq = np.concatenate([seq, [[int(np.argmax(lg[0, -1]))]]], axis=1)
        np.testing.assert_array_equal(gen[0], seq[0, 6:])


def test_forward_parity_gpt2():
    """gpt2: Conv1D [in,out] weights (canonicalized at load), fused c_attn,
    learned wpe positions, gelu_new MLP, tied lm_head."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="gpt2", vocab_size=128, n_embd=64, n_layer=2, n_head=4,
            n_positions=128,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "gpt2"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.family == "gpt2"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-4)


def test_forward_parity_bloom():
    """bloom: ALiBi, per-head-interleaved fused QKV, embedding layernorm."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="bloom", vocab_size=128, hidden_size=64, n_layer=2,
            n_head=4,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "bloom"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.family == "bloom"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_gpt2_quantize_e2e():
    """gpt2 end-to-end: quantize through the Conv1D tree, save (Conv1D dense
    leaves transposed back on disk), reload, generate."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="gpt2", vocab_size=128, n_embd=64, n_layer=2, n_head=4,
            n_positions=128,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval().save_pretrained(
            Path(tmp) / "gpt2", safe_serialization=True
        )
        m = GPTQModel.load(Path(tmp) / "gpt2", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 4  # c_attn/c_proj/c_fc/c_proj per layer
        eval_ids = jnp.asarray((np.arange(24).reshape(2, 12) % 127) + 1)
        a = np.asarray(forward_logits(m.spec, m.params, eval_ids))
        out_dir = Path(tmp) / "q"
        m.save(out_dir)
        m2 = GPTQModel.load(out_dir)
        b = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(b, a, atol=1e-5)
        gen = m2.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                          dtype=jnp.float32)
        assert gen.shape == (1, 4)


def test_bloom_quantize_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="bloom", vocab_size=128, hidden_size=64, n_layer=2,
            n_head=4,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval().save_pretrained(
            Path(tmp) / "bloom", safe_serialization=True
        )
        m = GPTQModel.load(Path(tmp) / "bloom", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 4
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert gen.shape == (1, 4)


def test_loader_roundtrip_through_writer():
    """dense load -> save via writer -> reload -> identical logits."""
    from gptqmodel_tpu.models.loader import CheckpointReader, build_params_tree
    from gptqmodel_tpu.models.spec import load_hf_config, spec_from_hf_config
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.models.writer import save_quantized
    from gptqmodel_tpu.quantization.config import QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(tmp, "llama")
        spec = spec_from_hf_config(load_hf_config(d))
        params = build_params_tree(CheckpointReader(d))
        out_dir = Path(tmp) / "resaved"
        save_quantized(
            out_dir, params, QuantizeConfig(), json.loads((d / "config.json").read_text())
        )
        qcfg2 = QuantizeConfig.from_pretrained(out_dir)
        assert qcfg2.bits == 4
        params2 = build_params_tree(CheckpointReader(out_dir), qcfg2)
        ids = jnp.asarray(np.arange(12).reshape(1, 12))
        a = forward_logits(spec, params, ids)
        b = forward_logits(spec, params2, ids)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_module_tree_parse():
    from gptqmodel_tpu.models.module_tree import parse_module_tree

    tree = [
        "model",
        "layers",
        "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
        },
    ]
    plan = parse_module_tree(tree)
    assert plan.layers_path == "model.layers"
    assert plan.capture_paths == ["input_layernorm", "post_attention_layernorm"]
    assert plan.build_subsets() == [
        ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
         "mlp.gate_proj", "mlp.up_proj"],
        ["self_attn.o_proj", "mlp.down_proj"],
    ]


def test_module_tree_overrides_per_method():
    """ModelDef.tree_for resolves per-method overrides (reference
    base.py:190 module_tree_overrides)."""
    from gptqmodel_tpu.models.definitions import ModelDef, _LLAMA_TREE

    alt = ("model", "layers", "#", {"self_attn": ("q_proj:0",)})
    d = ModelDef(_LLAMA_TREE, module_tree_overrides=(("awq", alt),))
    assert d.tree_for("gptq") is _LLAMA_TREE
    assert d.tree_for("awq") is alt

    from gptqmodel_tpu.quantization.config import METHOD

    assert d.tree_for(METHOD.AWQ) is alt  # enum resolves by value string
    assert ModelDef(_LLAMA_TREE).tree_for(METHOD.AWQ) is _LLAMA_TREE


def test_module_tree_moe_expansion():
    from gptqmodel_tpu.models.module_tree import parse_module_tree

    tree = [
        "model", "layers", "#",
        {
            "self_attn": ("q_proj:0", "o_proj:1"),
            "mlp:moe:?": {
                "gate": ("gate:!",),
                "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
            },
        },
    ]
    plan = parse_module_tree(tree)
    assert plan.has_moe
    subsets = plan.build_subsets(num_experts=2)
    assert "mlp.experts.0.gate_proj" in subsets[0]
    assert "mlp.experts.1.up_proj" in subsets[0]
    assert "mlp.experts.1.down_proj" in subsets[1]
    assert "mlp.gate" in plan.capture_paths


# --------------------------------------------------------------------------
# neox lineage (gpt_neox / gptj / falcon / phi / stablelm)
# --------------------------------------------------------------------------


def _tiny_neox_dir(tmp, model_type, **over):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg = AutoConfig.for_model(model_type=model_type, **over)
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
    d = Path(tmp) / model_type
    model.save_pretrained(d, safe_serialization=True)
    return d, model


@pytest.mark.parametrize(
    "model_type,over",
    [
        # partial rotary (pct 0.25) + dual-ln parallel residual (pythia shape)
        ("gpt_neox", dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          rotary_pct=0.25, use_parallel_residual=True,
                          max_position_embeddings=256)),
        # sequential-residual neox variant
        ("gpt_neox", dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          rotary_pct=0.5, use_parallel_residual=False,
                          max_position_embeddings=256)),
        # gptj: pair-interleaved partial rope, single-ln parallel residual,
        # biased lm_head
        ("gptj", dict(vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                      rotary_dim=8, n_positions=256)),
        # falcon-7b style: fused MQA qkv, single-ln parallel, no biases
        ("falcon", dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=4, multi_query=True,
                        parallel_attn=True, new_decoder_architecture=False,
                        bias=False, alibi=False)),
        # falcon new decoder architecture: grouped qkv + ln_attn/ln_mlp
        ("falcon", dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=4, num_kv_heads=2, multi_query=True,
                        parallel_attn=True, new_decoder_architecture=True,
                        bias=False, alibi=False)),
        # falcon-rw: ALiBi (pre-scale, bf16 slopes), sequential residual
        ("falcon", dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=4, multi_query=False,
                        parallel_attn=False, new_decoder_architecture=False,
                        bias=True, alibi=True)),
        # phi-2 style: shared-ln parallel residual, fc1/fc2, biased head
        ("phi", dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     partial_rotary_factor=0.5)),
        # stablelm: LayerNorm + partial rotary + gated silu MLP + GQA
        ("stablelm", dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, partial_rotary_factor=0.25,
                          use_qkv_bias=True)),
        ("stablelm", dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=4, partial_rotary_factor=0.25,
                          use_parallel_residual=True)),
    ],
)
def test_forward_parity_neox_family(model_type, over):
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_neox_dir(tmp, model_type, **over)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.family == "neox"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_gpt_neox_quantize_generate_e2e():
    """gpt_neox end-to-end: fused-qkv tree under the gpt_neox root, embed_out
    head, parallel residual — quantize, pack, reload-shaped generate."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_neox_dir(
            tmp, "gpt_neox", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
            rotary_pct=0.25, use_parallel_residual=True,
            max_position_embeddings=256,
        )
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # query_key_value / dense / dense_h_to_4h / dense_4h_to_h per layer
        assert len(rows) == 2 * 4
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert out.shape == (1, 4)


def test_phi_quantize_generate_e2e():
    """phi (parallel shared-ln) through its module tree + generate."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_neox_dir(
            tmp, "phi", vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            partial_rotary_factor=0.5,
        )
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 6  # q/k/v/dense/fc1/fc2 per layer
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert out.shape == (1, 4)


# --------------------------------------------------------------------------
# cohere / olmo / granite / starcoder2 / exaone4 lineage
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "model_type,over",
    [
        # cohere: mean-centered LN, shared-ln parallel residual, interleaved
        # rope, logit_scale, tied embeddings
        ("cohere", dict(layer_norm_eps=1e-5, logit_scale=0.0625)),
        # + per-head LayerNorm qk-norm (command-r-plus style)
        ("cohere", dict(use_qk_norm=True, num_key_value_heads=2)),
        # cohere2: sliding pattern, full-attention layers skip rope
        ("cohere2", dict(sliding_window=8, sliding_window_pattern=2,
                         num_hidden_layers=4, head_dim=16)),
        # olmo: non-parametric LayerNorm + clip_qkv
        ("olmo", dict(clip_qkv=0.4)),
        # olmo2: post-only norms, full-width q/k RMSNorm
        ("olmo2", dict(rms_norm_eps=1e-5)),
        # granite: mup multipliers
        ("granite", dict(embedding_multiplier=6.0, attention_multiplier=0.3,
                         residual_multiplier=0.5, logits_scaling=4.0)),
        # starcoder2: LayerNorm+bias, biased projections, plain c_fc MLP
        ("starcoder2", dict(use_bias=True, tie_word_embeddings=True)),
        # exaone4 full-attention variant: post-only norms + per-head qk norm
        # (HF config crashes on sliding_window=None w/o explicit layer_types)
        ("exaone4", dict(sliding_window=None,
                         layer_types=["full_attention"] * 2)),
        # exaone4 hybrid: sliding pattern, full layers skip rope
        ("exaone4", dict(sliding_window=8, sliding_window_pattern=2,
                         num_hidden_layers=4)),
    ],
)
def test_forward_parity_cohere_olmo_lineage(model_type, over):
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(tmp, model_type, **over)
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_olmoe():
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "olmoe", num_experts=8, num_experts_per_tok=2,
            norm_topk_prob=False,
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.num_experts == 8 and spec.qk_norm_wide
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_cohere_quantize_e2e():
    """Parallel-residual grouping: qkv + gate/up share subset 0."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(tmp, "cohere")
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 7
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert out.shape == (1, 4)


def test_olmo2_quantize_e2e():
    """norm_after lineage through the looper (capture sees RAW hidden)."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(tmp, "olmo2")
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 7
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert out.shape == (1, 4)


# --------------------------------------------------------------------------
# glm lineage + gpt_bigcode
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "model_type,over",
    [
        # glm: partial(0.5) interleaved rotary, fused gate_up, qkv bias
        ("glm", dict(head_dim=16, attention_bias=True, pad_token_id=0)),
        # glm4: + sandwich norms (post_self_attn / post_mlp)
        ("glm4", dict(head_dim=16, attention_bias=True, pad_token_id=0)),
    ],
)
def test_forward_parity_glm(model_type, over):
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(tmp, model_type, **over)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.rotary_dim == 8 and spec.rope_interleave
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_glm4_moe():
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "glm4_moe", head_dim=16, pad_token_id=0, n_routed_experts=8,
            num_experts_per_tok=2, n_shared_experts=1, n_group=2,
            topk_group=1, first_k_dense_replace=1, moe_intermediate_size=64,
            norm_topk_prob=True, use_qk_norm=True,
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.num_experts == 8 and spec.moe_scoring == "sigmoid"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


@pytest.mark.parametrize("multi_query", [True, False])
def test_forward_parity_gpt_bigcode(multi_query):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="gpt_bigcode", vocab_size=128, n_embd=64, n_layer=2,
            n_head=4, n_positions=128, multi_query=multi_query,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "bigcode"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.family == "gpt2"
        assert spec.num_kv_heads == (1 if multi_query else 4)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_glm4_quantize_e2e():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(tmp, "glm4", head_dim=16, attention_bias=True, pad_token_id=0)
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # q/k/v/o + gate_up/down per layer
        assert len(rows) == 2 * 6
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert out.shape == (1, 4)


def test_gpt_bigcode_quantize_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="gpt_bigcode", vocab_size=128, n_embd=64, n_layer=2,
            n_head=4, n_positions=128, multi_query=True,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "bigcode"
        tmodel.save_pretrained(d, safe_serialization=True)
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 4
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert out.shape == (1, 4)


# --------------------------------------------------------------------------
# ernie / nemotron / helium / hunyuan / persimmon
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "model_type,over",
    [
        ("ernie4_5", dict(use_bias=True, head_dim=16)),
        ("helium", dict(head_dim=16)),
        # nemotron: LayerNorm1P + non-gated relu2 MLP + partial rotary
        ("nemotron", dict(norm_eps=1e-5, partial_rotary_factor=0.5)),
        # hunyuan dense: per-head qk RMSNorm under query/key_layernorm names
        ("hunyuan_v1_dense", dict(head_dim=16)),
        # persimmon: neox-lineage fused qkv + relu2 + partial rotary
        ("persimmon", dict(hidden_act="relu2", qk_layernorm=False)),
    ],
)
def test_forward_parity_ernie_nemotron_lineage(model_type, over):
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(tmp, model_type, **over)
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_ernie4_5_moe():
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "ernie4_5_moe", head_dim=16, moe_num_experts=8, moe_k=2,
            moe_num_shared_experts=1, moe_layer_start_index=1,
            moe_intermediate_size=64, use_bias=False,
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.num_experts == 8 and spec.moe_scoring == "softmax"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_nemotron_quantize_e2e():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(tmp, "nemotron", norm_eps=1e-5)
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 6  # q/k/v/o + up/down
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert out.shape == (1, 4)


def test_forward_parity_mpt():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="mpt", vocab_size=128, d_model=64, n_layers=2,
            n_heads=4, max_seq_len=128,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "mpt"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.family == "neox" and spec.alibi
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_mpt_quantize_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="mpt", vocab_size=128, d_model=64, n_layers=2,
            n_heads=4, max_seq_len=128,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval().save_pretrained(
            Path(tmp) / "mpt", safe_serialization=True
        )
        m = GPTQModel.load(Path(tmp) / "mpt", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 4  # Wqkv/out_proj/up_proj/down_proj
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert out.shape == (1, 4)


def test_forward_parity_smollm3_nope_layers():
    """smollm3: every 4th layer runs WITHOUT rope (no_rope_layers)."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "smollm3", num_hidden_layers=4, pad_token_id=0,
            no_rope_layers=[1, 1, 1, 0], layer_types=["full_attention"] * 4,
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.no_rope_layers == (1, 1, 1, 0)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_phimoe():
    """phimoe: LayerNorm decoder + deterministic sparsemixer top-2."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "phimoe", num_local_experts=4, router_jitter_noise=0.01,
            rms_norm_eps=1e-5, attention_bias=True,
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.moe_scoring == "sparsemixer" and spec.norm_type == "ln"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_dbrx():
    """dbrx: fused [E*F, D] expert params split lazily by the reader
    wrapper; fused global-concat Wqkv; LayerNorm; top-1 L1-normed router."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="dbrx", vocab_size=128, d_model=64, n_heads=4,
            n_layers=2, max_seq_len=128,
            attn_config={"kv_n_heads": 2, "clip_qkv": 8.0},
            ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 4,
                        "moe_top_k": 2},
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "dbrx"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.num_experts == 4 and spec.clip_qkv == 8.0
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_dbrx_quantize_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="dbrx", vocab_size=128, d_model=64, n_heads=4,
            n_layers=2, max_seq_len=128,
            attn_config={"kv_n_heads": 2},
            ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 2,
                        "moe_top_k": 1},
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "dbrx", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "dbrx", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # qkv/o + 2 experts x 3 per layer
        assert len(rows) == 2 * (2 + 2 * 3), len(rows)
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert out.shape == (1, 4)
        # quantized export is canonical per-expert tensors; reload must
        # bypass the fused-split reader wrapper transparently
        from gptqmodel_tpu.models.transformer import forward_logits

        m.save(Path(tmp) / "q")
        m2 = GPTQModel.load(Path(tmp) / "q")
        ids2 = np.arange(24).reshape(2, 12) % 128
        a = np.asarray(forward_logits(m.spec, m.params, jnp.asarray(ids2)))
        b = np.asarray(forward_logits(m2.spec, m2.params, jnp.asarray(ids2)))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# remote-code archs (internlm2 / baichuan / minicpm): no transformers-native
# modeling exists, so the oracle is CONSTRUCTED — a tiny llama checkpoint is
# re-serialized under each arch's native tensor names/layouts and our
# forward must reproduce the llama torch logits.
# --------------------------------------------------------------------------


def _torch_sd(model):
    return {k: v.numpy() for k, v in model.state_dict().items()}


def _write_ckpt(d, tensors, config):
    import json as _json

    from safetensors.numpy import save_file

    d.mkdir(parents=True, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              d / "model.safetensors", metadata={"format": "pt"})
    (d / "config.json").write_text(_json.dumps(config))


def test_forward_parity_internlm2_constructed():
    with tempfile.TemporaryDirectory() as tmp:
        src, tmodel = _tiny_llama_dir(tmp, "llama", attention_bias=False)
        sd = _torch_sd(tmodel)
        nh, nkv, hd, L = 4, 2, 16, 2
        grp = nh // nkv
        out = {
            "model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
            "model.norm.weight": sd["model.norm.weight"],
            "output.weight": sd["lm_head.weight"],
        }
        for i in range(L):
            p = f"model.layers.{i}."
            q = sd[p + "self_attn.q_proj.weight"].reshape(nkv, grp, hd, -1)
            k = sd[p + "self_attn.k_proj.weight"].reshape(nkv, 1, hd, -1)
            v = sd[p + "self_attn.v_proj.weight"].reshape(nkv, 1, hd, -1)
            wqkv = np.concatenate([q, k, v], axis=1).reshape(-1, q.shape[-1])
            out[p + "attention.wqkv.weight"] = wqkv
            out[p + "attention.wo.weight"] = sd[p + "self_attn.o_proj.weight"]
            out[p + "feed_forward.w1.weight"] = sd[p + "mlp.gate_proj.weight"]
            out[p + "feed_forward.w3.weight"] = sd[p + "mlp.up_proj.weight"]
            out[p + "feed_forward.w2.weight"] = sd[p + "mlp.down_proj.weight"]
            out[p + "attention_norm.weight"] = sd[p + "input_layernorm.weight"]
            out[p + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
        cfg = dict(
            model_type="internlm2", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=L,
            num_attention_heads=nh, num_key_value_heads=nkv,
            rms_norm_eps=1e-6, rope_theta=10000.0, bias=False,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        d = Path(tmp) / "internlm2"
        _write_ckpt(d, out, cfg)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.qkv_layout == "grouped"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_baichuan_constructed():
    with tempfile.TemporaryDirectory() as tmp:
        src, tmodel = _tiny_llama_dir(
            tmp, "llama", num_key_value_heads=4, attention_bias=False
        )
        sd = _torch_sd(tmodel)
        out = {}
        for k, v in sd.items():
            if k.endswith("self_attn.q_proj.weight"):
                p = k[: -len("q_proj.weight")]
                out[p + "W_pack.weight"] = np.concatenate(
                    [sd[p + "q_proj.weight"], sd[p + "k_proj.weight"],
                     sd[p + "v_proj.weight"]], axis=0
                )
            elif k.endswith(("k_proj.weight", "v_proj.weight")) and "self_attn" in k:
                continue
            else:
                out[k] = v
        cfg = dict(
            model_type="baichuan", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, rms_norm_eps=1e-6,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        d = Path(tmp) / "baichuan"
        _write_ckpt(d, out, cfg)
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_minicpm_constructed():
    """Neutral mup factors (scale_emb=1, scale_depth=sqrt(L),
    dim_model_base=hidden) make minicpm == llama; non-neutral factors must
    move the logits the way the formulas say."""
    with tempfile.TemporaryDirectory() as tmp:
        src, tmodel = _tiny_llama_dir(tmp, "llama", attention_bias=False)
        sd = _torch_sd(tmodel)
        cfg = dict(
            model_type="minicpm", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-6,
            max_position_embeddings=256, tie_word_embeddings=False,
            scale_emb=1.0, scale_depth=float(2) ** 0.5, dim_model_base=64,
        )
        d = Path(tmp) / "minicpm"
        _write_ckpt(d, sd, cfg)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.residual_multiplier == 1.0 and spec.logit_scale == 1.0
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)

        from gptqmodel_tpu.models.spec import spec_from_hf_config

        cfg2 = dict(cfg, scale_emb=12.0, scale_depth=1.4, dim_model_base=32)
        spec2 = spec_from_hf_config(cfg2)
        assert spec2.embedding_multiplier == 12.0
        assert abs(spec2.residual_multiplier - 1.4 / 2**0.5) < 1e-9
        assert abs(spec2.logit_scale - 0.5) < 1e-9


def test_forward_parity_gpt_oss():
    """gpt_oss: fused interleaved expert tensors (reader-split), clamped
    GLU with biases, topk-then-softmax router, attention sinks, sliding
    alternation, yarn rope."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="gpt_oss", vocab_size=128, hidden_size=64,
            intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, num_local_experts=4,
            num_experts_per_tok=2, sliding_window=8,
            layer_types=["sliding_attention", "full_attention"],
            max_position_embeddings=256, tie_word_embeddings=False,
            rope_scaling=None, pad_token_id=0,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "gpt_oss"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.moe_scoring == "topk_softmax"
        assert spec.glu_clamp_limit == 7.0
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_gpt_oss_yarn():
    """gpt_oss default rope: yarn with truncate=False, shared by sliding
    AND full layers (no separate local base)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="gpt_oss", vocab_size=128, hidden_size=64,
            intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, num_local_experts=4,
            num_experts_per_tok=2, sliding_window=8,
            layer_types=["sliding_attention", "full_attention"],
            max_position_embeddings=256, tie_word_embeddings=False,
            pad_token_id=0,
            rope_scaling={"rope_type": "yarn", "factor": 8.0,
                          "beta_fast": 32.0, "beta_slow": 1.0,
                          "truncate": False,
                          "original_max_position_embeddings": 32},
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "gpt_oss_yarn"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_gpt_oss_quantize_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="gpt_oss", vocab_size=128, hidden_size=64,
            intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, num_local_experts=2,
            num_experts_per_tok=1, sliding_window=8,
            layer_types=["sliding_attention", "full_attention"],
            max_position_embeddings=256, tie_word_embeddings=False,
            rope_scaling=None, pad_token_id=0,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # q/k/v/o + 2 experts x 3 per layer
        assert len(rows) == 2 * (4 + 2 * 3), len(rows)
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert out.shape == (1, 4)


# --------------------------------------------------------------------------
# mamba family (falcon_mamba / mamba)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("model_type", ["falcon_mamba", "mamba"])
def test_forward_parity_mamba(model_type):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type=model_type, vocab_size=128, hidden_size=64,
            state_size=8, num_hidden_layers=2, conv_kernel=4, expand=2,
            time_step_rank=8, use_bias=False, use_conv_bias=True,
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / model_type
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.family == "mamba" and spec.mamba_d_inner == 128
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4)


def test_falcon_mamba_quantize_generate_e2e():
    """SSM lifecycle: quantize in/x/out projections (dt_proj stays dense,
    reference definitions/falcon_mamba.py), generate with conv+ssm caches,
    and the cached decode must match a cache-free re-forward."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="falcon_mamba", vocab_size=128, hidden_size=64,
            state_size=8, num_hidden_layers=2, conv_kernel=4, expand=2,
            time_step_rank=8, use_bias=False, use_conv_bias=True,
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 3  # in_proj / x_proj / out_proj per layer
        mods = {r["module"] for r in rows}
        assert "mixer.dt_proj" not in mods

        # cached generate == argmax chain of the cache-free forward
        prompt = np.arange(1, 7).reshape(1, 6)
        out = m.generate(prompt, max_new_tokens=3, dtype=jnp.float32)
        seq = prompt.copy()
        for _ in range(3):
            logits = np.asarray(
                forward_logits(m.spec, m.params, jnp.asarray(seq))
            )
            nxt = logits[:, -1].argmax(-1)
            seq = np.concatenate([seq, nxt[:, None]], axis=1)
        np.testing.assert_array_equal(out[0], seq[0, 6:])


def test_forward_parity_mamba2():
    """mamba2/SSD: per-head scalar A, grouped B/C, gated RMSNorm — our
    per-step scan must equal HF's chunked SSD formulation."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="mamba2", vocab_size=128, hidden_size=64,
            state_size=16, num_hidden_layers=2, conv_kernel=4, expand=2,
            num_heads=8, head_dim=16, n_groups=2, chunk_size=8,
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "mamba2"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.mamba_n_heads == 8 and spec.mamba_n_groups == 2
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4)


def test_mamba2_quantize_generate_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="mamba2", vocab_size=128, hidden_size=64,
            state_size=16, num_hidden_layers=2, conv_kernel=4, expand=2,
            num_heads=8, head_dim=16, n_groups=2, chunk_size=8,
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 2  # in_proj / out_proj per layer
        prompt = np.arange(1, 7).reshape(1, 6)
        out = m.generate(prompt, max_new_tokens=3, dtype=jnp.float32)
        seq = prompt.copy()
        for _ in range(3):
            logits = np.asarray(
                forward_logits(m.spec, m.params, jnp.asarray(seq))
            )
            seq = np.concatenate(
                [seq, logits[:, -1].argmax(-1)[:, None]], axis=1
            )
        np.testing.assert_array_equal(out[0], seq[0, 6:])


def test_forward_parity_bamba_hybrid():
    """bamba: mamba2 mixers with interleaved GQA attention layers."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="bamba", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=2,
            attn_layer_indices=[1], mamba_n_heads=8, mamba_d_head=16,
            mamba_d_state=16, mamba_n_groups=2, mamba_expand=2,
            mamba_chunk_size=8, max_position_embeddings=256,
            tie_word_embeddings=False, pad_token_id=0,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "bamba"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.layers_block_type == ("mamba", "attention", "mamba")
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4)


def test_bamba_quantize_generate_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="bamba", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=2,
            attn_layer_indices=[1], mamba_n_heads=8, mamba_d_head=16,
            mamba_d_state=16, mamba_n_groups=2, mamba_expand=2,
            mamba_chunk_size=8, max_position_embeddings=256,
            tie_word_embeddings=False, pad_token_id=0,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # 2 mamba layers x (in/out + 3 mlp) + 1 attn layer x (4 + 3 mlp)
        assert len(rows) == 2 * 5 + 7, len(rows)
        prompt = np.arange(1, 7).reshape(1, 6)
        out = m.generate(prompt, max_new_tokens=3, dtype=jnp.float32)
        seq = prompt.copy()
        for _ in range(3):
            logits = np.asarray(
                forward_logits(m.spec, m.params, jnp.asarray(seq))
            )
            seq = np.concatenate(
                [seq, logits[:, -1].argmax(-1)[:, None]], axis=1
            )
        np.testing.assert_array_equal(out[0], seq[0, 6:])


def test_forward_parity_llama4():
    """llama4: interleaved rope, L2 qk-norm after rope, NoPE layers with q
    temperature tuning, chunked attention, input-scaled sigmoid top-k MoE
    with fused experts + shared expert."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="llama4_text", vocab_size=128, hidden_size=64,
            intermediate_size=96, intermediate_size_mlp=128,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, num_local_experts=4,
            num_experts_per_tok=2, no_rope_layers=[1, 1, 1, 0],
            attention_chunk_size=4, attn_temperature_tuning=True,
            floor_scale=4, attn_scale=0.1, use_qk_norm=True,
            interleave_moe_layer_step=2,
            max_position_embeddings=256, tie_word_embeddings=False,
            pad_token_id=0,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "llama4"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.moe_scoring == "llama4" and spec.moe_input_scaled
        assert spec.attention_chunk_size == 4
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4)


def test_llama4_quantize_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="llama4_text", vocab_size=128, hidden_size=64,
            intermediate_size=96, intermediate_size_mlp=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, num_local_experts=2,
            num_experts_per_tok=1, no_rope_layers=[1, 0],
            attention_chunk_size=64, use_qk_norm=True,
            interleave_moe_layer_step=1,
            max_position_embeddings=256, tie_word_embeddings=False,
            pad_token_id=0,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # 4 attn + 2 experts x 3 + shared x 3 per layer
        assert len(rows) == 2 * (4 + 2 * 3 + 3), len(rows)
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert out.shape == (1, 4)


def test_forward_parity_lfm2_hybrid():
    """lfm2: gated short-conv layers interleaved with qk-normed attention."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="lfm2", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=2, conv_L_cache=3,
            layer_types=["conv", "full_attention", "conv"],
            block_auto_adjust_ff_dim=False,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "lfm2"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.layers_block_type == ("conv", "attention", "conv")
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_lfm2_quantize_generate_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="lfm2", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=2, conv_L_cache=3,
            layer_types=["conv", "full_attention", "conv"],
            block_auto_adjust_ff_dim=False,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # 2 conv layers x (2 + 3 mlp) + 1 attn layer x (4 + 3 mlp)
        assert len(rows) == 2 * 5 + 7, len(rows)
        prompt = np.arange(1, 7).reshape(1, 6)
        out = m.generate(prompt, max_new_tokens=3, dtype=jnp.float32)
        seq = prompt.copy()
        for _ in range(3):
            logits = np.asarray(
                forward_logits(m.spec, m.params, jnp.asarray(seq))
            )
            seq = np.concatenate(
                [seq, logits[:, -1].argmax(-1)[:, None]], axis=1
            )
        np.testing.assert_array_equal(out[0], seq[0, 6:])


def test_forward_parity_granitemoe():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="granitemoe", vocab_size=128, hidden_size=64,
            intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            num_local_experts=4, num_experts_per_tok=2,
            embedding_multiplier=6.0, attention_multiplier=0.3,
            residual_multiplier=0.5, logits_scaling=2.0,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "granitemoe"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.moe_scoring == "topk_softmax"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_granitemoehybrid():
    """granite 4.0 shape: mamba2 + attention hybrid, fused parallel experts
    + fused shared MLP, NoPE attention, mup multipliers."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="granitemoehybrid", vocab_size=128, hidden_size=64,
            intermediate_size=96, shared_intermediate_size=64,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, num_local_experts=4,
            num_experts_per_tok=2,
            layer_types=["mamba", "attention", "mamba"],
            mamba_n_heads=8, mamba_d_head=16, mamba_d_state=16,
            mamba_n_groups=2, mamba_expand=2, mamba_chunk_size=8,
            embedding_multiplier=2.0, residual_multiplier=0.7,
            attention_multiplier=0.25, logits_scaling=3.0,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "gmh"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.layers_block_type == ("mamba", "attention", "mamba")
        assert spec.no_rope_layers == (0, 0, 0)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4)


def test_granitemoehybrid_quantize_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="granitemoehybrid", vocab_size=128, hidden_size=64,
            intermediate_size=96, shared_intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, num_local_experts=2,
            num_experts_per_tok=1, layer_types=["mamba", "attention"],
            mamba_n_heads=8, mamba_d_head=16, mamba_d_state=16,
            mamba_n_groups=2, mamba_expand=2, mamba_chunk_size=8,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # mamba layer: in/out + 2 experts x 3 + shared 2; attn: 4 + 6 + 2
        assert len(rows) == (2 + 6 + 2) + (4 + 6 + 2), len(rows)
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=3,
                         dtype=jnp.float32)
        assert out.shape == (1, 3)


def test_forward_parity_jamba():
    """jamba: NoPE attention + mamba1 (weighted dt/B/C norms) + periodic
    MoE layers."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="jamba", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2,
            attn_layer_period=2, attn_layer_offset=1,
            expert_layer_period=2, expert_layer_offset=0,
            num_experts=4, num_experts_per_tok=2, mamba_d_state=8,
            mamba_d_conv=4, mamba_expand=2, mamba_dt_rank=8,
            use_mamba_kernels=False, max_position_embeddings=256,
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "jamba"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.layers_block_type == ("mamba", "attention", "mamba",
                                          "attention")
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4)


def test_jamba_quantize_generate_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="jamba", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            attn_layer_period=2, attn_layer_offset=1,
            expert_layer_period=2, expert_layer_offset=0,
            num_experts=2, num_experts_per_tok=1, mamba_d_state=8,
            mamba_d_conv=4, mamba_expand=2, mamba_dt_rank=8,
            use_mamba_kernels=False, max_position_embeddings=256,
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # layer0 mamba+moe: 3 + 2x3; layer1 attn+dense: 4 + 3
        assert len(rows) == (3 + 6) + (4 + 3), len(rows)
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=3,
                         dtype=jnp.float32)
        assert out.shape == (1, 3)


@pytest.mark.parametrize(
    "model_type,over",
    [
        # seed_oss: separate attention_bias / attention_out_bias knobs
        # (modeling_seed_oss.py:158) — both presence-driven from checkpoint
        ("seed_oss", {"attention_bias": True, "attention_out_bias": False,
                      "head_dim": 16}),
        # arcee: non-gated up/down relu2 MLP (modeling_arcee.py:50)
        ("arcee", {}),
        # bitnet: attn/ffn sub-norms before o_proj/down_proj + relu2 GLU
        # (modeling_bitnet.py:74,178)
        ("bitnet", {"hidden_act": "relu2"}),
    ],
)
def test_forward_parity_seed_arcee_bitnet(model_type, over):
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(tmp, model_type, **over)
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_apertus():
    """apertus: per-head q/k RMSNorm, attention_layernorm/feedforward_layernorm
    naming, non-gated xIELU MLP with learnable alpha_p/alpha_n
    (modeling_apertus.py:43-70,186-213)."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(tmp, "apertus")
        spec, params, ids, ours = _jax_logits(d)
        assert spec.qk_norm and spec.hidden_act == "xielu"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_bitnet_quantize_e2e():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(tmp, "bitnet", hidden_act="relu2")
        rng = np.random.default_rng(0)
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 7, len(rows)
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert gen.shape == (1, 4)


def test_forward_parity_dots1():
    """dots1 (rednote): deepseek-v3 sigmoid/noaux_tc router with correction
    bias + group-limited top-k, per-head qk-norm GQA (no MLA), dense
    first_k layers, fused shared_experts (modeling_dots1.py:173-360)."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "dots1",
            n_routed_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=32, n_shared_experts=1,
            first_k_dense_replace=1, n_group=2, topk_group=1,
            routed_scaling_factor=1.5, norm_topk_prob=True,
            head_dim=16, sliding_window=None,
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.moe_scoring == "sigmoid" and spec.qk_norm and not spec.mla
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_hunyuan_v1_moe():
    """hunyuan_v1_moe: query/key_layernorm per-head norms, softmax->top-k
    renormalized routing via nested gate.wg fp32 Linear, always-on ungated
    shared_mlp (modeling_hunyuan_v1_moe.py:231-302)."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "hunyuan_v1_moe",
            num_experts=4, moe_topk=2, head_dim=16,
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.num_experts == 4 and spec.qk_norm
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_hunyuan_moe_quantize_e2e():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(tmp, "hunyuan_v1_moe", num_experts=2,
                               moe_topk=1, head_dim=16)
        rng = np.random.default_rng(0)
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # 4 attn + 2 experts x 3 + shared_mlp x 3 per layer
        assert len(rows) == 2 * (4 + 6 + 3), len(rows)
        mods = {r["module"] for r in rows}
        assert "mlp.shared_mlp.up_proj" in mods
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert gen.shape == (1, 4)


def test_forward_parity_gpt_neo():
    """gpt_neo: nested attn.attention split projections, NO attention
    scaling, global/local layer alternation with an 8-token window (< T=12,
    so the local mask is load-bearing), learned positions, gelu_new MLP."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="gpt_neo", vocab_size=128, hidden_size=64,
            num_layers=2, num_heads=4,
            attention_types=[[["global", "local"], 1]], window_size=8,
            intermediate_size=128, max_position_embeddings=256,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "m"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.family == "gpt2" and spec.attn_scale == 1.0
        assert spec.layer_types[1] == "sliding_attention"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_codegen():
    """codegen: mp_num=4 block-fused qkv in q,v,k order (deinterleaved by
    CodeGenReader), gptj-style parallel residual + rotate_every_two partial
    rotary (modeling_codegen.py:92-177)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="codegen", vocab_size=128, n_embd=64, n_head=4,
            n_layer=2, rotary_dim=8, n_positions=256, n_inner=None,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "m"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.family == "neox" and spec.parallel_residual
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_gpt_neo_quantize_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="gpt_neo", vocab_size=128, hidden_size=64,
            num_layers=2, num_heads=4,
            attention_types=[[["global", "local"], 1]], window_size=8,
            intermediate_size=128, max_position_embeddings=256,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 6, len(rows)
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert gen.shape == (1, 4)


def test_forward_parity_diffllama():
    """diffllama differential attention: halved softmax head pairs with
    lambda_full = exp(lq1.lk1) - exp(lq2.lk2) + lambda_init(layer),
    parameter-free RMSNorm(2hd), (1-lambda_init) scale
    (modeling_diffllama.py:117-220). lambda_init is injected by the loader
    as runtime-only _lam_init (never exported)."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(tmp, "diffllama")
        spec, params, ids, ours = _jax_logits(d)
        lp0 = params["model"]["layers"][0]["self_attn"]
        assert "_lam_init" in lp0 and abs(float(lp0["_lam_init"]) - 0.2) < 1e-6
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_diffllama_quantize_roundtrip():
    """Quantize + save must NOT export the runtime _lam_init; reload must
    re-derive it and generate."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.loader import CheckpointReader

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(tmp, "diffllama")
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 7, len(rows)
        out_dir = Path(tmp) / "q"
        m.save(out_dir)
        names = list(CheckpointReader(out_dir).names())
        assert not any("_lam_init" in n for n in names)
        assert any("lambda_q1" in n for n in names)
        m2 = GPTQModel.load(out_dir)
        gen = m2.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                          dtype=jnp.float32)
        assert gen.shape == (1, 4)


def _tiny_vl_dir(tmp, kind):
    import torch

    if kind == "llava":
        from transformers import LlavaConfig, LlavaForConditionalGeneration

        cfg = LlavaConfig(
            text_config=dict(
                model_type="llama", vocab_size=128, hidden_size=64,
                intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=256,
            ),
            vision_config=dict(
                model_type="clip_vision_model", hidden_size=32,
                intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, image_size=28, patch_size=14,
            ),
            image_token_index=127,
        )
        torch.manual_seed(0)
        model = LlavaForConditionalGeneration(cfg).to(torch.float32).eval()
    else:
        from transformers.models.qwen2_vl import (
            Qwen2VLConfig, Qwen2VLForConditionalGeneration,
        )

        cfg = Qwen2VLConfig(
            text_config=dict(
                vocab_size=128, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=256,
                rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            ),
            vision_config=dict(
                depth=2, embed_dim=32, hidden_size=64, num_heads=2,
                in_channels=3, spatial_merge_size=2, patch_size=14,
                temporal_patch_size=2,
            ),
        )
        torch.manual_seed(0)
        model = Qwen2VLForConditionalGeneration(cfg).to(torch.float32).eval()
    d = Path(tmp) / kind
    model.save_pretrained(d, safe_serialization=True)
    return d, model


@pytest.mark.parametrize("kind", ["llava", "qwen2_vl"])
def test_forward_parity_vl_text_tower(kind):
    """VL text-tower parity on text-only input: model.language_model.* is
    canonicalized to model.* (wrap_vl_reader); qwen2_vl mrope with equal
    t/h/w sections == standard rope. The vision tower loads as plain
    weights (layer_container keeps its indexed blocks out of the decoder
    stream)."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_vl_dir(tmp, kind)
        spec, params, ids, ours = _jax_logits(d)
        assert "layers" in params["model"]  # renamed text tower
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_qwen2_vl_quantize_preserves_vision_tower():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.loader import CheckpointReader

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_vl_dir(tmp, "qwen2_vl")
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 7, len(rows)
        out_dir = Path(tmp) / "q"
        m.save(out_dir)
        names = list(CheckpointReader(out_dir).names())
        assert any("visual.blocks." in n for n in names)
        assert any("model.layers.0.self_attn.q_proj.qweight" == n for n in names)
        m2 = GPTQModel.load(out_dir)
        gen = m2.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                          dtype=jnp.float32)
        assert gen.shape == (1, 4)


def test_forward_parity_xverse_constructed():
    """xverse (remote code): exact llama body + tensor names under its own
    model_type (reference definitions/xverse.py subclasses LlamaQModel)."""
    with tempfile.TemporaryDirectory() as tmp:
        src, tmodel = _tiny_llama_dir(
            tmp, "llama", num_key_value_heads=4, attention_bias=False
        )
        cfg = dict(
            model_type="xverse", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, rms_norm_eps=1e-6,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        d = Path(tmp) / "xverse"
        _write_ckpt(d, _torch_sd(tmodel), cfg)
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_exaone_constructed():
    """exaone (EXAONE-3.x remote code): llama body under transformer.h with
    attn.attention nesting and c_fc_0/c_fc_1/c_proj MLP names (reference
    definitions/exaone.py tree) -> canonicalized by wrap_exaone_reader."""
    with tempfile.TemporaryDirectory() as tmp:
        src, tmodel = _tiny_llama_dir(tmp, "llama", attention_bias=False)
        sd = _torch_sd(tmodel)
        out = {"lm_head.weight": sd["lm_head.weight"],
               "transformer.wte.weight": sd["model.embed_tokens.weight"],
               "transformer.ln_f.weight": sd["model.norm.weight"]}
        ren = {
            "input_layernorm.weight": "ln_1.weight",
            "post_attention_layernorm.weight": "ln_2.weight",
            "self_attn.q_proj.weight": "attn.attention.q_proj.weight",
            "self_attn.k_proj.weight": "attn.attention.k_proj.weight",
            "self_attn.v_proj.weight": "attn.attention.v_proj.weight",
            "self_attn.o_proj.weight": "attn.attention.out_proj.weight",
            "mlp.gate_proj.weight": "mlp.c_fc_0.weight",
            "mlp.up_proj.weight": "mlp.c_fc_1.weight",
            "mlp.down_proj.weight": "mlp.c_proj.weight",
        }
        for i in range(2):
            for canon, native in ren.items():
                out[f"transformer.h.{i}.{native}"] = sd[
                    f"model.layers.{i}.{canon}"]
        cfg = dict(
            model_type="exaone", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_layers=2, num_attention_heads=4,
            num_key_value_heads=2, layer_norm_epsilon=1e-6,
            activation_function="silu", max_position_embeddings=256,
            tie_word_embeddings=False,
        )
        d = Path(tmp) / "exaone"
        _write_ckpt(d, out, cfg)
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_minicpm3_constructed():
    """minicpm3 (remote code): deepseek-style MLA under the same tensor
    names + minicpm mup factors (neutral here) — oracle is the HF
    deepseek_v2 MLA-dense model (reference definitions/minicpm3.py tree)."""
    with tempfile.TemporaryDirectory() as tmp:
        src, tmodel = _tiny_llama_dir(
            tmp, "deepseek_v2", q_lora_rank=24, topk_method="greedy",
            **dict(_DSV2_TINY, first_k_dense_replace=2),
        )
        cfg = dict(
            model_type="minicpm3", vocab_size=128, hidden_size=64,
            intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
            q_lora_rank=24, kv_lora_rank=16, qk_rope_head_dim=8,
            qk_nope_head_dim=8, v_head_dim=8, rms_norm_eps=1e-6,
            max_position_embeddings=256, tie_word_embeddings=False,
            scale_emb=1.0, scale_depth=float(2) ** 0.5, dim_model_base=64,
        )
        d = Path(tmp) / "minicpm3"
        _write_ckpt(d, _torch_sd(tmodel), cfg)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.mla and spec.q_lora_rank == 24
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_mimo_quantize_preserves_mtp_layers():
    """mimo (remote code): qwen2 body + model.mtp_layers that must load and
    re-export dense (reference definitions/mimo.py + out_of_model_tensors
    pattern)."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.loader import CheckpointReader

    with tempfile.TemporaryDirectory() as tmp:
        src, tmodel = _tiny_llama_dir(tmp, "qwen2")
        sd = _torch_sd(tmodel)
        sd["model.mtp_layers.0.self_attn.q_proj.weight"] = (
            np.ones((64, 64), np.float32)
        )
        cfg = dict(
            model_type="mimo", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-6,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        d = Path(tmp) / "mimo"
        _write_ckpt(d, sd, cfg)
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)

        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)],
                   batch_size=4)
        out_dir = Path(tmp) / "q"
        m.save(out_dir)
        names = list(CheckpointReader(out_dir).names())
        assert "model.mtp_layers.0.self_attn.q_proj.weight" in names


_Q3N_TINY = dict(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, linear_num_value_heads=4, linear_num_key_heads=2,
    linear_key_head_dim=8, linear_value_head_dim=8, linear_conv_kernel_dim=4,
    num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
    shared_expert_intermediate_size=64, decoder_sparse_step=1,
    mlp_only_layers=[], norm_topk_prob=True, max_position_embeddings=256,
    tie_word_embeddings=False,
    layer_types=["linear_attention", "full_attention"],
)


def test_forward_parity_qwen3_next():
    """qwen3_next hybrid: GatedDeltaNet linear-attention layer (grouped
    qkvz/ba ordering, causal conv, l2-normed gated delta rule, gated
    RMSNorm) + gated full attention (output sigmoid gate from the doubled
    q_proj, partial rotary 0.25) + qwen2_moe-style MoE
    (modeling_qwen3_next.py:321-857). HF prefill uses the chunked rule; our
    lax.scan recurrence is the same operator algebraically."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(tmp, "qwen3_next", **_Q3N_TINY)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.attn_output_gate and spec.layers_block_type[0] == "linear"
        assert spec.rotary_dim == 4
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-3)


def test_qwen3_next_quantize_generate_e2e():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(
            tmp, "qwen3_next",
            **dict(_Q3N_TINY, num_experts=2, num_experts_per_tok=1),
        )
        rng = np.random.default_rng(0)
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=8))
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # layer0 linear_attn (3) + moe (2x3 + shared 3); layer1 attn (4) + same
        assert len(rows) == (3 + 9) + (4 + 9), len(rows)
        mods = {r["module"] for r in rows}
        assert "linear_attn.in_proj_qkvz" in mods
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert gen.shape == (1, 4)


_MINIMAX_TINY = dict(
    vocab_size=128, hidden_size=64, intermediate_size=32,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, num_local_experts=4, num_experts_per_tok=2,
    max_position_embeddings=256, tie_word_embeddings=False,
    layer_types=["linear_attention", "full_attention"], block_size=256,
    full_attn_alpha_factor=1.0, full_attn_beta_factor=1.0,
    linear_attn_alpha_factor=1.0, linear_attn_beta_factor=1.0,
    mlp_alpha_factor=1.0, mlp_beta_factor=1.0,
)


def test_forward_parity_minimax():
    """minimax hybrid: lightning linear attention (silu qkv, per-head
    layer-indexed decay, sigmoid output gate, full-width RMSNorm) + full
    attention + mixtral MoE; residuals use the NORMED hidden with
    alpha/beta factors (modeling_minimax.py:118-575)."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "minimax",
            **dict(_MINIMAX_TINY, linear_attn_beta_factor=0.7,
                   mlp_alpha_factor=0.9),
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.minimax_residual
        assert spec.layers_block_type == ("lightning", "attention")
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-3)


def test_minimax_slope_derivation_without_buffer():
    """Checkpoints without the persisted slope_rate buffer must re-derive
    per-head slopes from the loader-injected _layer_idx."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(tmp, "minimax", **_MINIMAX_TINY)
        sd = {k: v for k, v in _torch_sd(tmodel).items()
              if not k.endswith(("slope_rate", "query_decay", "key_decay",
                                 "diagonal_decay"))}
        import json as _json
        cfg = _json.loads((d / "config.json").read_text())
        d2 = Path(tmp) / "stripped"
        _write_ckpt(d2, sd, cfg)
        spec, params, ids, ours = _jax_logits(d2)
        lp0 = params["model"]["layers"][0]["self_attn"]
        assert "_layer_idx" in lp0 and "slope_rate" not in lp0
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-3)


def test_minimax_quantize_generate_e2e():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(
            tmp, "minimax",
            **dict(_MINIMAX_TINY, num_local_experts=2, num_experts_per_tok=1),
        )
        rng = np.random.default_rng(0)
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # layer0 lightning: qkv+gate+out (3) + 2x3 experts;
        # layer1 full attn: 4 + 2x3
        assert len(rows) == (3 + 6) + (4 + 6), len(rows)
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert gen.shape == (1, 4)


def test_forward_parity_falcon_h1():
    """falcon_h1: EVERY layer runs mamba2 + attention in parallel on the
    same normed input, with mup multipliers on embeddings/k/attn/ssm/mlp/
    lm_head and a per-span mup vector on the SSM in_proj; per-group gated
    norm BEFORE the gate (modeling_falcon_h1.py:1046-1235)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="falcon_h1", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, tie_word_embeddings=False,
            mamba_d_ssm=64, mamba_n_heads=4, mamba_n_groups=2,
            mamba_d_state=16, mamba_d_conv=4, mamba_expand=1,
            mamba_use_mlp=True,
            embedding_multiplier=2.0, lm_head_multiplier=0.5,
            key_multiplier=0.9, attention_in_multiplier=1.1,
            attention_out_multiplier=0.8, ssm_in_multiplier=1.2,
            ssm_out_multiplier=0.7, mlp_multipliers=[1.3, 0.6],
            ssm_multipliers=[1.1, 0.9, 1.2, 0.8, 1.05],
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "m"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.falcon_h1 and spec.key_multiplier == 0.9
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_falcon_h1_quantize_generate_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="falcon_h1", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, tie_word_embeddings=False,
            mamba_d_ssm=64, mamba_n_heads=8, mamba_n_groups=2,
            mamba_d_state=16, mamba_d_conv=4, mamba_expand=1,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # per layer: attn 4 + mamba in/out 2 + mlp 3
        assert len(rows) == 2 * 9, len(rows)
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert gen.shape == (1, 4)


@pytest.mark.parametrize(
    "model_type,over",
    [
        # ministral: mistral + explicit sliding/full layer_types
        ("ministral", {"sliding_window": 8, "head_dim": 16,
                       "layer_types": ["sliding_attention", "full_attention"]}),
        # olmo3: olmo2 post-only norms + wide qk-norm + sliding alternation
        ("olmo3", {"sliding_window": 8,
                   "layer_types": ["sliding_attention", "full_attention"]}),
        # vaultgemma: gemma2 attention with plain pre-norms
        ("vaultgemma", {"head_dim": 16, "query_pre_attn_scalar": 16,
                        "attn_logit_softcapping": None, "pad_token_id": 0,
                        "layer_types": ["sliding_attention", "full_attention"],
                        "sliding_window": 8}),
    ],
)
def test_forward_parity_ministral_olmo3_vaultgemma(model_type, over):
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(tmp, model_type, **over)
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_flex_olmo():
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "flex_olmo", pad_token_id=0,
            num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        )
        spec, params, ids, ours = _jax_logits(d)
        assert spec.norm_after and spec.qk_norm_wide and spec.num_experts == 4
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-3)


def test_forward_parity_granitemoeshared():
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_llama_dir(
            tmp, "granitemoeshared",
            num_local_experts=4, num_experts_per_tok=2,
            shared_intermediate_size=64,
            embedding_multiplier=2.0, attention_multiplier=0.2,
            residual_multiplier=0.8, logits_scaling=2.0,
        )
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-3)


def _tiny_vl2_dir(tmp, mt):
    """Second VL batch: build tiny vision+text composites from AutoConfig."""
    import torch
    from transformers import AutoConfig

    t64 = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, max_position_embeddings=256,
               tie_word_embeddings=False)
    if mt == "mistral3":
        cfg = AutoConfig.for_model(
            model_type=mt,
            text_config=dict(model_type="mistral", sliding_window=None, **t64),
            vision_config=dict(model_type="pixtral", hidden_size=32,
                               intermediate_size=64, num_hidden_layers=1,
                               num_attention_heads=2, image_size=28,
                               patch_size=14, head_dim=16),
            multimodal_projector_bias=False, vision_feature_layer=-1,
        )
    elif mt == "llava_onevision":
        cfg = AutoConfig.for_model(
            model_type=mt, image_token_index=127, video_token_index=126,
            text_config=dict(model_type="qwen2", **t64),
            vision_config=dict(model_type="siglip_vision_model",
                               hidden_size=32, intermediate_size=64,
                               num_hidden_layers=1, num_attention_heads=2,
                               image_size=28, patch_size=14),
        )
    elif mt == "glm4v":
        cfg = AutoConfig.for_model(
            model_type=mt, image_token_id=127, video_token_id=126,
            text_config=dict(model_type="glm4v_text", **t64, head_dim=16,
                             rope_scaling={"type": "default",
                                           "mrope_section": [2, 3, 3]}),
            vision_config=dict(hidden_size=32, intermediate_size=64,
                               depth=2, num_heads=2, image_size=28,
                               patch_size=14, out_hidden_size=64),
        )
    else:
        raise AssertionError(mt)
    torch.manual_seed(0)
    from transformers import AutoModelForImageTextToText

    model = AutoModelForImageTextToText.from_config(cfg).to(torch.float32).eval()
    d = Path(tmp) / mt
    model.save_pretrained(d, safe_serialization=True)
    return d, model


@pytest.mark.parametrize("mt", ["mistral3", "llava_onevision", "glm4v"])
def test_forward_parity_vl_batch2(mt):
    """Second VL text-tower batch on text-only input (reference
    definitions/mistral3.py, llava_qwen2, glm4v)."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_vl2_dir(tmp, mt)
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_forward_parity_longcat_flash():
    """longcat_flash: dual-sublayer layers (2 MLA attns with lora mup
    scalings + 2 dense MLPs) and a shortcut MoE with zero/identity experts
    (modeling_longcat_flash.py:120-500)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="longcat_flash", vocab_size=128, hidden_size=64,
            ffn_hidden_size=128, expert_ffn_hidden_size=32,
            num_layers=2, num_attention_heads=4,
            kv_lora_rank=16, q_lora_rank=24, qk_rope_head_dim=8,
            qk_nope_head_dim=8, v_head_dim=8, head_dim=8,
            n_routed_experts=4, zero_expert_num=2, moe_topk=2,
            routed_scaling_factor=1.5, max_position_embeddings=256,
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "m"
        tmodel.save_pretrained(d, safe_serialization=True)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.longcat and spec.zero_expert_num == 2
        assert spec.num_experts == 6
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-3)


def test_longcat_quantize_generate_e2e():
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="longcat_flash", vocab_size=128, hidden_size=64,
            ffn_hidden_size=128, expert_ffn_hidden_size=32,
            num_layers=2, num_attention_heads=4,
            kv_lora_rank=16, q_lora_rank=24, qk_rope_head_dim=8,
            qk_nope_head_dim=8, v_head_dim=8, head_dim=8,
            n_routed_experts=2, zero_expert_num=2, moe_topk=1,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=8))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # per layer: 2 attn x 5 + 2 mlps x 3 + 2 experts x 3
        assert len(rows) == 2 * (10 + 6 + 6), len(rows)
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                         dtype=jnp.float32)
        assert gen.shape == (1, 4)
