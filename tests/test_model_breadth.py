"""Batch-3 model breadth: alias archs, VL tower prefixes, reader flattens.

Covers the reference MODEL_MAP entries that are body-clones of other archs
(auto.py: yi/stablelm_epoch/longllama -> LlamaQModel, marin -> Qwen3QModel,
dream -> qwen2 body, moss -> codegen body, phi4mm -> phi3 + LoRA shells) and
the VL text-tower prefix families (llm.model.* ovis/minicpmv,
language.model.* deepseek_vl_v2, thinker.model.* qwen omni,
model.language_model.* deepseek_vl/interns1).

Oracle strategy: these model_types have no transformers-native classes at
our pin, so we construct checkpoints from the *canonical* torch body and
rewrite config.json / tensor names to the alias layout — parity then proves
the remap + spec alias reproduce the canonical semantics exactly.
"""

import json
import re
import tempfile
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_body(tmp, model_type, **over):
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


def _patch_model_type(d, alias):
    cfg = json.loads((Path(d) / "config.json").read_text())
    cfg["model_type"] = alias
    (Path(d) / "config.json").write_text(json.dumps(cfg))


def _jax_logits(model_dir, n_ids=24):
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
    ids = np.arange(n_ids).reshape(2, n_ids // 2) % spec.vocab_size
    logits = forward_logits(spec, params, jnp.asarray(ids), dtype=jnp.float32)
    return spec, params, ids, np.asarray(logits)


def _torch_logits(model, ids):
    import torch

    with torch.no_grad():
        return model(torch.tensor(ids)).logits.numpy()


def _torch_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _write_ckpt(d, tensors, config):
    from safetensors.numpy import save_file

    d = Path(d)
    d.mkdir(parents=True, exist_ok=True)
    save_file(
        {k: np.ascontiguousarray(v) for k, v in tensors.items()},
        d / "model.safetensors",
    )
    (d / "config.json").write_text(json.dumps(config))


# --------------------------------------------------------------------------
# alias archs: same body, different model_type string


@pytest.mark.parametrize(
    "alias,body,over",
    [
        ("yi", "llama", {}),
        ("telechat", "llama", {}),
        ("instella", "llama", {}),
        ("dream", "qwen2", {}),
        ("marin", "qwen3", {"head_dim": 16}),
        ("ministral3", "mistral", {"sliding_window": None}),
    ],
)
def test_alias_forward_parity(alias, body, over):
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_body(tmp, body, **over)
        _patch_model_type(d, alias)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.model_type == alias
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_moss_parity_constructed():
    """moss = codegen body (fused mp_num=4 qkv, definitions/moss.py) under
    its own model_type; the codegen reader deinterleaves qkv_proj."""
    with tempfile.TemporaryDirectory() as tmp:
        import torch
        from transformers import AutoConfig, AutoModelForCausalLM

        cfg = AutoConfig.for_model(
            model_type="codegen", vocab_size=128, n_embd=64, n_layer=2,
            n_head=4, n_positions=256, rotary_dim=16, n_inner=None,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        d = Path(tmp) / "moss"
        tmodel.save_pretrained(d, safe_serialization=True)
        _patch_model_type(d, "moss")
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


# --------------------------------------------------------------------------
# VL tower prefixes


def _renamed_tower(sd, prefix):
    """Rename canonical llama tensors into a VL tower layout."""
    out = {}
    for k, v in sd.items():
        if k == "lm_head.weight":
            # ovis keeps lm_head under llm.*; new-style keeps it top-level
            out[
                (prefix + "lm_head.weight")
                if prefix in ("llm.", "language.", "thinker.")
                else k
            ] = v
        elif k.startswith("model."):
            out[prefix + k if prefix.endswith(".") else k] = v
        else:
            out[k] = v
    return out


@pytest.mark.parametrize(
    "mt,prefix,cfg_key",
    [
        ("ovis", "llm.", "llm_config"),
        ("minicpmv", "llm.", None),  # llm fields inline in the top config
        ("deepseek_vl", "model.language_model#", "language_config"),
        ("qwen2_5_omni", "thinker.", "thinker_config"),
    ],
)
def test_vl_prefix_forward_parity(mt, prefix, cfg_key):
    with tempfile.TemporaryDirectory() as tmp:
        src, tmodel = _tiny_body(tmp, "llama")
        sd = _torch_sd(tmodel)
        if prefix == "model.language_model#":
            # new-style nesting: model.* -> model.language_model.*
            out = {}
            for k, v in sd.items():
                if k.startswith("model."):
                    out["model.language_model." + k[len("model."):]] = v
                else:
                    out[k] = v
        else:
            out = _renamed_tower(sd, prefix)
        # a vision-tower tensor that must pass through untouched
        out["visual.head.weight"] = np.zeros((4, 4), np.float32)
        llama_fields = dict(
            model_type="llama", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-6, max_position_embeddings=256,
            tie_word_embeddings=False,
        )
        if cfg_key is None:
            cfg = dict(llama_fields, model_type=mt)
        elif cfg_key == "thinker_config":
            cfg = {"model_type": mt, cfg_key: {"text_config": llama_fields}}
        else:
            cfg = {"model_type": mt, cfg_key: llama_fields}
        d = Path(tmp) / mt
        _write_ckpt(d, out, cfg)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.model_type == mt
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_ovis_quantize_preserves_tower_and_reloads():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.loader import CheckpointReader

    with tempfile.TemporaryDirectory() as tmp:
        src, tmodel = _tiny_body(tmp, "llama")
        out = _renamed_tower(_torch_sd(tmodel), "llm.")
        out["visual.head.weight"] = np.zeros((4, 4), np.float32)
        cfg = dict(
            model_type="ovis",
            llm_config=dict(
                model_type="llama", vocab_size=128, hidden_size=64,
                intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                rms_norm_eps=1e-6, max_position_embeddings=256,
                tie_word_embeddings=False,
            ),
        )
        d = Path(tmp) / "ovis"
        _write_ckpt(d, out, cfg)
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        assert len(rows) == 2 * 7, len(rows)
        out_dir = Path(tmp) / "q"
        m.save(out_dir)
        names = list(CheckpointReader(out_dir).names())
        assert "visual.head.weight" in names
        assert "model.layers.0.self_attn.q_proj.qweight" in names
        m2 = GPTQModel.load(out_dir)
        gen = m2.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                          dtype=jnp.float32)
        assert gen.shape == (1, 4)


def test_phi4mm_base_layer_flatten():
    """phi4mm: phi3 body whose projections sit under LoRA shells; the
    reference quantizes <proj>.base_layer (definitions/phi4.py:17-41) —
    wrap_phi4mm_reader flattens those names; lora_A/B pass through."""
    with tempfile.TemporaryDirectory() as tmp:
        src, tmodel = _tiny_body(
            tmp, "phi3", intermediate_size=96, pad_token_id=0
        )
        sd = _torch_sd(tmodel)
        out = {}
        for k, v in sd.items():
            for proj in ("qkv_proj", "o_proj", "gate_up_proj", "down_proj"):
                tag = f".{proj}.weight"
                if k.endswith(tag):
                    k = k[: -len(tag)] + f".{proj}.base_layer.weight"
                    break
            out[k] = v
        out["model.layers.0.self_attn.qkv_proj.lora_A.vision.weight"] = (
            np.zeros((2, 64), np.float32)
        )
        cfg = json.loads((Path(src) / "config.json").read_text())
        cfg["model_type"] = "phi4mm"
        d = Path(tmp) / "phi4mm"
        _write_ckpt(d, out, cfg)
        spec, params, ids, ours = _jax_logits(d)
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_chatglm_parity_constructed():
    """chatglm (remote code) == glm family body under native tensor names:
    construct from a tiny torch glm model (fused qkv+bias, fused swiglu,
    half interleaved rotary are IDENTICAL semantics — transformers' glm is
    the chatglm/glm-4 port), rename to the chatglm layout, translate the
    config; parity proves wrap_chatglm_reader + the spec branch."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="glm", vocab_size=128, hidden_size=64,
            intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            max_position_embeddings=256, rms_norm_eps=1e-6,
            attention_bias=True, tie_word_embeddings=False, pad_token_id=0,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        sd = _torch_sd(tmodel)
        out = {
            "transformer.embedding.word_embeddings.weight":
                sd["model.embed_tokens.weight"],
            "transformer.encoder.final_layernorm.weight":
                sd["model.norm.weight"],
            "transformer.output_layer.weight": sd["lm_head.weight"],
        }
        for i in range(2):
            s, d = f"model.layers.{i}.", f"transformer.encoder.layers.{i}."
            out[d + "input_layernorm.weight"] = sd[s + "input_layernorm.weight"]
            out[d + "post_attention_layernorm.weight"] = (
                sd[s + "post_attention_layernorm.weight"]
            )
            out[d + "self_attention.query_key_value.weight"] = np.concatenate(
                [sd[s + f"self_attn.{p}_proj.weight"] for p in "qkv"], axis=0
            )
            out[d + "self_attention.query_key_value.bias"] = np.concatenate(
                [sd[s + f"self_attn.{p}_proj.bias"] for p in "qkv"], axis=0
            )
            out[d + "self_attention.dense.weight"] = (
                sd[s + "self_attn.o_proj.weight"]
            )
            out[d + "mlp.dense_h_to_4h.weight"] = (
                sd[s + "mlp.gate_up_proj.weight"]
            )
            out[d + "mlp.dense_4h_to_h.weight"] = sd[s + "mlp.down_proj.weight"]
        glm_cfg = dict(
            model_type="chatglm", num_layers=2, padded_vocab_size=128,
            hidden_size=64, ffn_hidden_size=96, num_attention_heads=4,
            kv_channels=16, multi_query_attention=True,
            multi_query_group_num=2, layernorm_epsilon=1e-6,
            add_qkv_bias=True, seq_length=256, rope_ratio=1.0,
            tie_word_embeddings=False,
        )
        d = Path(tmp) / "chatglm"
        _write_ckpt(d, out, glm_cfg)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.rotary_dim == 8 and spec.rope_interleave
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_qwen1_parity_constructed():
    """qwen (QWen-1 remote code) == llama body with fused biased c_attn and
    w1/w2 swiglu (w2 = silu branch). Constructed from a tiny torch llama
    with attention_bias (o_proj bias zeroed — qwen has none)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="llama", vocab_size=128, hidden_size=64,
            intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            max_position_embeddings=256, rms_norm_eps=1e-6,
            attention_bias=True, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        with torch.no_grad():
            for lyr in tmodel.model.layers:
                lyr.self_attn.o_proj.bias.zero_()
        sd = _torch_sd(tmodel)
        out = {
            "transformer.wte.weight": sd["model.embed_tokens.weight"],
            "transformer.ln_f.weight": sd["model.norm.weight"],
            "lm_head.weight": sd["lm_head.weight"],
        }
        for i in range(2):
            s, d = f"model.layers.{i}.", f"transformer.h.{i}."
            out[d + "ln_1.weight"] = sd[s + "input_layernorm.weight"]
            out[d + "ln_2.weight"] = sd[s + "post_attention_layernorm.weight"]
            out[d + "attn.c_attn.weight"] = np.concatenate(
                [sd[s + f"self_attn.{p}_proj.weight"] for p in "qkv"], axis=0
            )
            out[d + "attn.c_attn.bias"] = np.concatenate(
                [sd[s + f"self_attn.{p}_proj.bias"] for p in "qkv"], axis=0
            )
            out[d + "attn.c_proj.weight"] = sd[s + "self_attn.o_proj.weight"]
            out[d + "mlp.w2.weight"] = sd[s + "mlp.gate_proj.weight"]
            out[d + "mlp.w1.weight"] = sd[s + "mlp.up_proj.weight"]
            out[d + "mlp.c_proj.weight"] = sd[s + "mlp.down_proj.weight"]
        qcfg = dict(
            model_type="qwen", vocab_size=128, hidden_size=64,
            intermediate_size=192,  # qwen convention: 2x the per-proj width
            num_hidden_layers=2, num_attention_heads=4,
            layer_norm_epsilon=1e-6, seq_length=256,
            tie_word_embeddings=False,
        )
        d = Path(tmp) / "qwen"
        _write_ckpt(d, out, qcfg)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.intermediate_size == 96
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_internlm_parity_constructed():
    """internlm v1 (remote code; reference definitions/internlm.py) ==
    llama + qkv/o bias (config key "bias")."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_body(tmp, "llama", attention_bias=True)
        cfg = json.loads((Path(d) / "config.json").read_text())
        cfg["model_type"] = "internlm"
        cfg["bias"] = True
        (Path(d) / "config.json").write_text(json.dumps(cfg))
        spec, params, ids, ours = _jax_logits(d)
        assert spec.attention_bias
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_refinedweb_parity_constructed():
    """RefinedWeb(Model) (falcon-rw remote code; reference definitions/
    rw.py): falcon body with ln_1/ln_2 norm names and GPT-style config keys
    — wrap_rw_reader + the key-translation spec branch must reproduce the
    transformers falcon port exactly (alibi, non-parallel residual)."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="falcon", vocab_size=128, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            parallel_attn=False, alibi=True, multi_query=False,
            new_decoder_architecture=False, bias=True,
            layer_norm_epsilon=1e-5, tie_word_embeddings=False)
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        sd = _torch_sd(tmodel)
        out = {}
        for k, v in sd.items():
            k = k.replace(".input_layernorm.", ".ln_1.")
            k = k.replace(".post_attention_layernorm.", ".ln_2.")
            out[k] = v
        rw_cfg = dict(
            model_type="RefinedWebModel", vocab_size=128, hidden_size=64,
            n_layer=2, n_head=4, parallel_attn=False, alibi=True,
            multi_query=False, bias=True, layer_norm_epsilon=1e-5,
            tie_word_embeddings=False)
        d = Path(tmp) / "rw"
        _write_ckpt(d, out, rw_cfg)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.alibi and not spec.parallel_residual
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_telechat_split_reader_parity_constructed():
    """telechat2 (remote code; reference definitions/telechat2.py):
    query + PER-HEAD fused key_value + dense under transformer.h —
    TeleChatReader must split [nkv, 2, hd] kv blocks back to canonical
    k_proj/v_proj bit-exactly (llama GQA oracle)."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_body(tmp, "llama")
        sd = _torch_sd(tmodel)
        out = {
            "transformer.word_embeddings.weight": sd["model.embed_tokens.weight"],
            "transformer.ln_f.weight": sd["model.norm.weight"],
            "lm_head.weight": sd["lm_head.weight"],
        }
        hd = 64 // 4
        for i in range(2):
            s, dst = f"model.layers.{i}.", f"transformer.h.{i}."
            out[dst + "input_layernorm.weight"] = sd[s + "input_layernorm.weight"]
            out[dst + "post_attention_layernorm.weight"] = (
                sd[s + "post_attention_layernorm.weight"])
            out[dst + "self_attention.query.weight"] = sd[s + "self_attn.q_proj.weight"]
            k = sd[s + "self_attn.k_proj.weight"].reshape(-1, 1, hd, 64)
            v = sd[s + "self_attn.v_proj.weight"].reshape(-1, 1, hd, 64)
            out[dst + "self_attention.key_value.weight"] = (
                np.concatenate([k, v], axis=1).reshape(-1, 64))
            out[dst + "self_attention.dense.weight"] = sd[s + "self_attn.o_proj.weight"]
            for p in ("gate_proj", "up_proj", "down_proj"):
                out[dst + f"mlp.{p}.weight"] = sd[s + f"mlp.{p}.weight"]
        tc_cfg = dict(
            model_type="telechat2", vocab_size=128, hidden_size=64,
            n_layer=2, n_head=4, num_key_value_heads=2, ffn_hidden_size=128,
            seq_length=256, layer_norm_epsilon=1e-6,
            tie_word_embeddings=False)
        d2 = Path(tmp) / "telechat2"
        _write_ckpt(d2, out, tc_cfg)
        spec, params, ids, ours = _jax_logits(d2)
        assert spec.num_kv_heads == 2
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_gpt_pangu_parity_constructed():
    """gpt_pangu (PanguAlpha remote code; reference definitions/
    pangu_alpha.py): gpt2 body with SEPARATE q/k/v nn.Linears — built from
    a tiny torch gpt2 by de-fusing c_attn (Conv1D transpose). Exercises the
    new direct-split branch of gpt2_attention."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="gpt2", vocab_size=128, n_embd=64, n_layer=2,
            n_head=4, n_positions=256, tie_word_embeddings=True)
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        sd = _torch_sd(tmodel)
        out = {
            "transformer.wte.weight": sd["transformer.wte.weight"],
            "transformer.wpe.weight": sd["transformer.wpe.weight"],
            "transformer.ln_f.weight": sd["transformer.ln_f.weight"],
            "transformer.ln_f.bias": sd["transformer.ln_f.bias"],
        }
        for i in range(2):
            s, dst = f"transformer.h.{i}.", f"transformer.h.{i}."
            for ln in ("ln_1", "ln_2"):
                out[dst + f"{ln}.weight"] = sd[s + f"{ln}.weight"]
                out[dst + f"{ln}.bias"] = sd[s + f"{ln}.bias"]
            W = sd[s + "attn.c_attn.weight"].T  # Conv1D [in,3h] -> [3h,in]
            b = sd[s + "attn.c_attn.bias"]
            for j, p in enumerate(("q_proj", "k_proj", "v_proj")):
                out[dst + f"attn.{p}.weight"] = np.ascontiguousarray(
                    W[j * 64 : (j + 1) * 64])
                out[dst + f"attn.{p}.bias"] = b[j * 64 : (j + 1) * 64]
            out[dst + "attn.c_proj.weight"] = sd[s + "attn.c_proj.weight"].T
            out[dst + "attn.c_proj.bias"] = sd[s + "attn.c_proj.bias"]
            out[dst + "mlp.c_fc.weight"] = sd[s + "mlp.c_fc.weight"].T
            out[dst + "mlp.c_fc.bias"] = sd[s + "mlp.c_fc.bias"]
            out[dst + "mlp.c_proj.weight"] = sd[s + "mlp.c_proj.weight"].T
            out[dst + "mlp.c_proj.bias"] = sd[s + "mlp.c_proj.bias"]
        pg_cfg = dict(
            model_type="gpt_pangu", vocab_size=128, hidden_size=64,
            num_layers=2, num_heads=4, intermediate_size=4 * 64,
            max_position_embeddings=256, layer_norm_epsilon=1e-5,
            activation_function="gelu_new", tie_word_embeddings=True)
        d = Path(tmp) / "pangu"
        _write_ckpt(d, out, pg_cfg)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.family == "gpt2"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_hrm_dual_stack_flatten_parity():
    """hrm_text (reference definitions/hrm_text.py): dual L_module/H_module
    stacks — wrap_hrm_reader must flatten them into one model.layers stack
    (L first, H offset). A 4-layer llama oracle split 2+2 across the two
    containers must reproduce the sequential forward exactly."""
    with tempfile.TemporaryDirectory() as tmp:
        d, tmodel = _tiny_body(tmp, "llama", num_hidden_layers=4)
        sd = _torch_sd(tmodel)
        out = {}
        for k, v in sd.items():
            m = re.match(r"^model\.layers\.(\d+)\.(.*)$", k)
            if m is None:
                out[k] = v
                continue
            i = int(m.group(1))
            mod = "L_module" if i < 2 else "H_module"
            out[f"model.{mod}.layers.{i % 2}.{m.group(2)}"] = v
        hrm_cfg = dict(
            model_type="hrm_text", vocab_size=128, hidden_size=64,
            intermediate_size=128, L_layers=2, H_layers=2, num_heads=4,
            num_key_value_heads=2, rms_norm_eps=1e-6,
            max_position_embeddings=256, tie_word_embeddings=False)
        d2 = Path(tmp) / "hrm"
        _write_ckpt(d2, out, hrm_cfg)
        spec, params, ids, ours = _jax_logits(d2)
        assert spec.num_layers == 4
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


def test_qwen3_5_split_deltanet_parity_constructed():
    """qwen3_5(_moe)_text (reference definitions/qwen3_5.py /
    qwen3_5_moe.py): qwen3_next semantics with SEPARATE deltanet
    projections. Built from a tiny torch qwen3_next by de-interleaving the
    grouped in_proj_qkvz/-ba into flat in_proj_qkv/-z/-b/-a — parity vs the
    torch qwen3_next oracle proves the split forward path."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="qwen3_next", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            linear_num_value_heads=4, linear_num_key_heads=2,
            linear_key_head_dim=8, linear_value_head_dim=8,
            linear_conv_kernel_dim=4, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=32, shared_expert_intermediate_size=64,
            decoder_sparse_step=1, mlp_only_layers=[], norm_topk_prob=True,
            max_position_embeddings=256, tie_word_embeddings=False,
            layer_types=["linear_attention", "full_attention"])
        torch.manual_seed(0)
        tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        sd = _torch_sd(tmodel)
        nk, nv, hk, hv = 2, 4, 8, 8
        grp = nv // nk
        key_dim, value_dim = nk * hk, nv * hv
        out = {}
        for k, v in sd.items():
            if k.endswith("linear_attn.in_proj_qkvz.weight"):
                base = k[: -len("in_proj_qkvz.weight")]
                g = v.reshape(nk, 2 * hk + 2 * grp * hv, -1)
                q = g[:, :hk].reshape(key_dim, -1)
                kk = g[:, hk : 2 * hk].reshape(key_dim, -1)
                vv = g[:, 2 * hk : 2 * hk + grp * hv].reshape(value_dim, -1)
                z = g[:, 2 * hk + grp * hv :].reshape(value_dim, -1)
                out[base + "in_proj_qkv.weight"] = np.concatenate([q, kk, vv])
                out[base + "in_proj_z.weight"] = np.ascontiguousarray(z)
            elif k.endswith("linear_attn.in_proj_ba.weight"):
                base = k[: -len("in_proj_ba.weight")]
                g = v.reshape(nk, 2 * grp, -1)
                out[base + "in_proj_b.weight"] = np.ascontiguousarray(
                    g[:, :grp].reshape(nv, -1))
                out[base + "in_proj_a.weight"] = np.ascontiguousarray(
                    g[:, grp:].reshape(nv, -1))
            else:
                out[k] = v
        q35_cfg = dict(
            model_type="qwen3_5_moe_text", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            linear_num_value_heads=4, linear_num_key_heads=2,
            linear_key_head_dim=8, linear_value_head_dim=8,
            linear_conv_kernel_dim=4, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=32, shared_expert_intermediate_size=64,
            norm_topk_prob=True, max_position_embeddings=256,
            tie_word_embeddings=False, rms_norm_eps=1e-6,
            layer_types=["linear_attention", "full_attention"])
        d = Path(tmp) / "qwen3_5"
        _write_ckpt(d, out, q35_cfg)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.layers_block_type[0] == "linear"
        theirs = _torch_logits(tmodel, ids)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-3)


def test_decilm_nas_blocks_parity_constructed():
    """decilm / nemotron-nas (reference definitions/decilm.py): NAS
    block_configs heterogeneity — per-layer GQA (n_heads_in_group), no_op
    sublayers, replace_with_linear sublayers. Oracle: a hand-written torch
    forward implementing exactly the DeciLM block semantics over the same
    tensors (llama rope/rms/swiglu pieces)."""
    import torch

    h, nh, hd, V = 64, 4, 16, 128
    inter = 96
    torch.manual_seed(0)

    def lin(o, i):
        return (torch.randn(o, i, dtype=torch.float64) * 0.07).float()

    # block plan: [full kv=2 + mlp, noop-attn + mlp, linear+linear,
    #              full kv=1 + noop-ffn]
    tensors = {}
    P = {}

    def add(name, t):
        tensors[name] = t
        P[name] = torch.as_tensor(t)

    add("model.embed_tokens.weight", lin(V, h))
    add("model.norm.weight", torch.ones(h))
    add("lm_head.weight", lin(V, h))

    for i, kvh in ((0, 2), (3, 1)):
        p = f"model.layers.{i}."
        add(p + "input_layernorm.weight", torch.ones(h) + 0.1 * i)
        add(p + "self_attn.q_proj.weight", lin(nh * hd, h))
        add(p + "self_attn.k_proj.weight", lin(kvh * hd, h))
        add(p + "self_attn.v_proj.weight", lin(kvh * hd, h))
        add(p + "self_attn.o_proj.weight", lin(h, nh * hd))
    for i in (0, 1):
        p = f"model.layers.{i}."
        add(p + "post_attention_layernorm.weight", torch.ones(h) - 0.05 * i)
        add(p + "mlp.gate_proj.weight", lin(inter, h))
        add(p + "mlp.up_proj.weight", lin(inter, h))
        add(p + "mlp.down_proj.weight", lin(h, inter))
    add("model.layers.2.self_attn.linear_attn.weight", lin(h, h))
    add("model.layers.2.post_attention_layernorm.weight", torch.ones(h))
    add("model.layers.2.mlp.linear_mlp.weight", lin(h, h))

    cfg = dict(
        model_type="nemotron-nas", vocab_size=V, hidden_size=h,
        intermediate_size=inter, num_hidden_layers=4,
        num_attention_heads=nh, num_key_value_heads=2, rms_norm_eps=1e-6,
        max_position_embeddings=256, tie_word_embeddings=False,
        block_configs=[
            {"attention": {"n_heads_in_group": 2}, "ffn": {}},
            {"attention": {"no_op": True}, "ffn": {}},
            {"attention": {"replace_with_linear": True},
             "ffn": {"replace_with_linear": True}},
            {"attention": {"n_heads_in_group": 4}, "ffn": {"no_op": True}},
        ])

    def rms(x, w, eps=1e-6):
        v = x.pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(v + eps) * w

    def rope_cs(T, theta=10000.0):
        inv = 1.0 / theta ** (torch.arange(0, hd, 2).float() / hd)
        t = torch.arange(T).float()[:, None] * inv[None, :]
        emb = torch.cat([t, t], dim=-1)
        return emb.cos(), emb.sin()

    def rot_half(x):
        x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
        return torch.cat([-x2, x1], dim=-1)

    def attention(x, p, kvh):
        B, T, _ = x.shape
        q = (x @ P[p + "self_attn.q_proj.weight"].T).view(B, T, nh, hd)
        k = (x @ P[p + "self_attn.k_proj.weight"].T).view(B, T, kvh, hd)
        v = (x @ P[p + "self_attn.v_proj.weight"].T).view(B, T, kvh, hd)
        cos, sin = rope_cs(T)
        q = q * cos[None, :, None] + rot_half(q) * sin[None, :, None]
        k = k * cos[None, :, None] + rot_half(k) * sin[None, :, None]
        k = k.repeat_interleave(nh // kvh, dim=2)
        v = v.repeat_interleave(nh // kvh, dim=2)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        logits = (q @ k.transpose(-1, -2)) * hd ** -0.5
        mask = torch.full((T, T), float("-inf")).triu(1)
        probs = torch.softmax(logits + mask, dim=-1)
        out = (probs @ v).transpose(1, 2).reshape(B, T, nh * hd)
        return out @ P[p + "self_attn.o_proj.weight"].T

    def mlp(x, p):
        g = x @ P[p + "mlp.gate_proj.weight"].T
        u = x @ P[p + "mlp.up_proj.weight"].T
        return (torch.nn.functional.silu(g) * u) @ P[p + "mlp.down_proj.weight"].T

    def oracle(ids):
        x = P["model.embed_tokens.weight"][torch.as_tensor(ids)]
        # L0: full attn kv=2 + mlp
        p = "model.layers.0."
        x = x + attention(rms(x, P[p + "input_layernorm.weight"]), p, 2)
        x = x + mlp(rms(x, P[p + "post_attention_layernorm.weight"]), p)
        # L1: attention no_op, mlp only
        p = "model.layers.1."
        x = x + mlp(rms(x, P[p + "post_attention_layernorm.weight"]), p)
        # L2: linear attention + linear mlp
        p = "model.layers.2."
        x = x + rms(x, P["model.layers.2.input_layernorm.weight"]) @ (
            P[p + "self_attn.linear_attn.weight"].T)
        x = x + rms(x, P[p + "post_attention_layernorm.weight"]) @ (
            P[p + "mlp.linear_mlp.weight"].T)
        # L3: full attn kv=1, ffn no_op
        p = "model.layers.3."
        x = x + attention(rms(x, P[p + "input_layernorm.weight"]), p, 1)
        x = rms(x, P["model.norm.weight"])
        return x @ P["lm_head.weight"].T

    # L2 needs an input_layernorm for the linear-attn slot
    add("model.layers.2.input_layernorm.weight", torch.ones(h) + 0.02)

    with tempfile.TemporaryDirectory() as tmp:
        d = Path(tmp) / "decilm"
        _write_ckpt(d, {k: np.asarray(v) for k, v in tensors.items()}, cfg)
        spec, params, ids, ours = _jax_logits(d)
        assert spec.layer_kv_heads == (2, 0, 0, 1)
        with torch.no_grad():
            theirs = oracle(ids).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=3e-4)


# --------------------------------------------------------------------------
# registry / spec smoke for every batch-3 model_type


def test_batch3_registry_and_spec_smoke():
    from gptqmodel_tpu.models.definitions import REGISTRY

    new_types = [
        "yi", "stablelm_epoch", "longllama", "instella", "mobilellm",
        "dream", "deci", "nemotron-nas", "ministral3", "llava_qwen2",
        "marin", "kimi_k2", "telechat", "voxtral", "glm_ocr", "glmasr",
        "deepseek_vl", "deepseek_vl_v2", "deepseek_ocr2", "kimi_k25",
        "ovis", "ovis2", "ovis2_5", "ovis2_6_next", "ovis2_6_moe",
        "minicpmv", "minicpmo", "minicpmv4_6", "internvl_chat", "interns1",
        "mllama", "mllama_text_model", "qwen2_5_omni", "qwen3_omni_moe",
        "phi4mm", "moss",
        # batch-B MoE / hybrid archs
        "afmoe", "klear", "laguna", "hy_v3", "cohere2_moe", "solar_open",
        "solar_open2", "grinmoe", "minimax_m2", "mimo_v2", "glm4_moe_lite",
        "glm_moe_dsa", "deepseek_v4", "axk2", "brumby", "lfm2_moe", "hymba",
        "zamba", "zamba2", "nemotron_h", "dbrx_converted", "gemma3n",
        "gemma3n_text", "gemma4", "gemma4_text", "gemma4_unified",
        "gemma4_unified_text", "intern_s2_preview", "inkling_mm_model",
        "ernie4_5_vl_moe", "ernie4_5_moe_vl", "qwen2_vl_text",
        "qwen2_5_vl_text", "glm4v_moe_text", "bailing_moe", "bailing_hybrid",
        "llada2_moe", "chatglm", "qwen",
        "internlm", "inkling", "RefinedWeb", "RefinedWebModel", "telechat",
        "telechat2", "gpt_pangu", "hrm_text", "nemotron_labs_diffusion",
        "nemotron_h_puzzle", "nemotronh_nano_omni_reasoning_v3",
        "minimax_m3_vl", "qwen3_5", "qwen3_5_text", "qwen3_5_moe",
        "qwen3_5_moe_text", "minicpmv4_6",
    ]
    for t in new_types:
        assert t in REGISTRY, t
        assert REGISTRY[t].layers_container, t


def test_batch3_trees_parse_and_expand():
    """Every new tree parses through the DSL and builds concrete subsets
    (catches leaf typos / bad nesting before a real checkpoint does)."""
    from gptqmodel_tpu.models.definitions import REGISTRY
    from gptqmodel_tpu.models.module_tree import parse_module_tree

    for t in [
        "afmoe", "klear", "laguna", "hy_v3", "cohere2_moe", "solar_open",
        "solar_open2", "minimax_m2", "mimo_v2", "glm4_moe_lite",
        "glm_moe_dsa", "deepseek_v4", "axk2", "brumby", "lfm2_moe", "hymba",
        "zamba", "zamba2", "nemotron_h", "dbrx_converted", "gemma3n",
        "intern_s2_preview", "inkling_mm_model", "ernie4_5_vl_moe",
        "bailing_moe", "llada2_moe",
        "nemotron_h_puzzle", "minimax_m3_vl", "qwen3_5_moe_text", "hrm_text",
        "gpt_pangu", "telechat2", "nemotron_labs_diffusion",
    ]:
        plan = parse_module_tree(list(REGISTRY[t].module_tree))
        subsets = plan.build_subsets(num_experts=4)
        assert subsets and all(subsets), t
        assert plan.layers_path, t


def _bailing_ckpt(d, L=2, h=64, heads=4, kv=2, E=4, top=2, inter=96, V=128):
    """Constructed tiny bailing_moe checkpoint (fused attention.query_key_value
    + deepseek-style routed/shared MoE; reference definitions/bailing_moe.py)."""
    rng = np.random.default_rng(0)
    hd = h // heads

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    t = {"model.word_embeddings.weight": w(V, h),
         "model.norm.weight": np.ones(h, np.float32),
         "lm_head.weight": w(V, h)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(h, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        t[p + "attention.query_key_value.weight"] = w(h + 2 * kv * hd, h)
        t[p + "attention.dense.weight"] = w(h, h)
        t[p + "mlp.gate.weight"] = w(E, h)
        for e in range(E):
            ep = p + f"mlp.experts.{e}."
            t[ep + "gate_proj.weight"] = w(inter, h)
            t[ep + "up_proj.weight"] = w(inter, h)
            t[ep + "down_proj.weight"] = w(h, inter)
        sp = p + "mlp.shared_experts."
        t[sp + "gate_proj.weight"] = w(inter, h)
        t[sp + "up_proj.weight"] = w(inter, h)
        t[sp + "down_proj.weight"] = w(h, inter)
    cfg = dict(
        model_type="bailing_moe", vocab_size=V, hidden_size=h,
        intermediate_size=inter, num_hidden_layers=L,
        num_attention_heads=heads, num_key_value_heads=kv,
        rms_norm_eps=1e-6, max_position_embeddings=256,
        num_experts=E, num_experts_per_tok=top, moe_intermediate_size=inter,
        num_shared_experts=1, norm_topk_prob=True,
        tie_word_embeddings=False,
    )
    _write_ckpt(d, t, cfg)


def test_bailing_moe_quantize_e2e():
    """bailing_moe mechanical e2e: remapped fused qkv + routed/shared MoE
    quantizes, saves, reloads, generates (no HF oracle at our pin)."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        d = Path(tmp) / "bailing"
        _bailing_ckpt(d)
        m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize(
            [rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4
        )
        # per layer: qkv+o (2) + 4 experts x3 + shared x3 + (maybe failsafe)
        assert len(rows) >= 2 * (2 + 3), len(rows)
        out_dir = Path(tmp) / "q"
        m.save(out_dir)
        m2 = GPTQModel.load(out_dir)
        gen = m2.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4,
                          dtype=jnp.float32)
        assert gen.shape == (1, 4)
