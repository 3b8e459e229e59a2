"""On-chip verify for the final breadth batch: telechat2 (split kv reader)
and qwen3_5_moe_text (split deltanet) through load -> quantize -> generate."""

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

t0 = time.time()


def log(*a):
    print(f"[t+{time.time()-t0:5.0f}s]", *a, flush=True)


import jax

log("platform:", jax.devices())

import torch
from transformers import AutoConfig, AutoModelForCausalLM

from tests.test_model_breadth import _torch_sd, _write_ckpt
from gptqmodel_tpu import GPTQModel, QuantizeConfig

# ---- telechat2: split kv reader e2e ----
with tempfile.TemporaryDirectory() as tmp:
    cfg = AutoConfig.for_model(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rms_norm_eps=1e-6, tie_word_embeddings=False)
    torch.manual_seed(0)
    tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
    sd = _torch_sd(tmodel)
    out = {
        "transformer.word_embeddings.weight": sd["model.embed_tokens.weight"],
        "transformer.ln_f.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    hd = 16
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
        seq_length=256, layer_norm_epsilon=1e-6, tie_word_embeddings=False)
    d = Path(tmp) / "telechat2"
    _write_ckpt(d, out, tc_cfg)
    m = GPTQModel.load(str(d), QuantizeConfig(bits=4, group_size=32))
    m.quantize([np.array([1, 5, 9, 2, 7, 3, 8, 4] * 4, np.int32)] * 4)
    qdir = Path(tmp) / "q"
    m.save(str(qdir))
    toks = GPTQModel.load(str(qdir)).generate(
        np.array([[1, 5, 9, 2]], np.int32), max_new_tokens=4)
    log("telechat2 e2e on-chip:", np.asarray(toks).tolist())

# ---- qwen3_5_moe_text: split deltanet e2e ----
with tempfile.TemporaryDirectory() as tmp:
    cfg = AutoConfig.for_model(
        model_type="qwen3_next", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, linear_num_value_heads=4,
        linear_num_key_heads=2, linear_key_head_dim=8,
        linear_value_head_dim=8, linear_conv_kernel_dim=4, num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=32,
        shared_expert_intermediate_size=64, decoder_sparse_step=1,
        mlp_only_layers=[], norm_topk_prob=True,
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
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, linear_num_value_heads=4,
        linear_num_key_heads=2, linear_key_head_dim=8,
        linear_value_head_dim=8, linear_conv_kernel_dim=4, num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=32,
        shared_expert_intermediate_size=64, norm_topk_prob=True,
        max_position_embeddings=256, tie_word_embeddings=False,
        rms_norm_eps=1e-6,
        layer_types=["linear_attention", "full_attention"])
    d = Path(tmp) / "qwen3_5"
    _write_ckpt(d, out, q35_cfg)
    m = GPTQModel.load(str(d), QuantizeConfig(bits=4, group_size=8))
    m.quantize([np.array([1, 5, 9, 2, 7, 3, 8, 4] * 6, np.int32)] * 4)
    qdir = Path(tmp) / "q35"
    m.save(str(qdir))
    toks = GPTQModel.load(str(qdir)).generate(
        np.array([[1, 5, 9, 2]], np.int32), max_new_tokens=4)
    log("qwen3_5 split-deltanet e2e on-chip:", np.asarray(toks).tolist())

log("VERIFY OK")
