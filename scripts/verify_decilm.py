"""On-chip verify for the decilm NAS batch: standard llama path (decoder
restructure regression check) + heterogeneous nemotron-nas blocks through
load -> quantize -> generate."""

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

from tests.test_model_breadth import _write_ckpt
from gptqmodel_tpu import GPTQModel, QuantizeConfig

# ---- 1. plain llama through the restructured decoder layer ----
with tempfile.TemporaryDirectory() as tmp:
    cfg = AutoConfig.for_model(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rms_norm_eps=1e-6, tie_word_embeddings=False)
    torch.manual_seed(0)
    tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
    d = Path(tmp) / "llama"
    tmodel.save_pretrained(d, safe_serialization=True)
    m = GPTQModel.load(str(d), QuantizeConfig(bits=4, group_size=32))
    m.quantize([np.array([1, 5, 9, 2, 7, 3, 8, 4] * 4, np.int32)] * 4)
    qdir = Path(tmp) / "q"
    m.save(str(qdir))
    toks = GPTQModel.load(str(qdir)).generate(
        np.array([[1, 5, 9, 2]], np.int32), max_new_tokens=4)
    log("llama e2e on-chip:", np.asarray(toks).tolist())

# ---- 2. decilm heterogeneous blocks ----
torch.manual_seed(1)
h, nh, hd, V, inter = 64, 4, 16, 128, 96


def lin(o, i):
    return (torch.randn(o, i) * 0.07).numpy()


tensors = {
    "model.embed_tokens.weight": lin(V, h),
    "model.norm.weight": np.ones(h, np.float32),
    "lm_head.weight": lin(V, h),
}
for i, kvh in ((0, 2), (3, 1)):
    p = f"model.layers.{i}."
    tensors[p + "input_layernorm.weight"] = np.ones(h, np.float32)
    tensors[p + "self_attn.q_proj.weight"] = lin(nh * hd, h)
    tensors[p + "self_attn.k_proj.weight"] = lin(kvh * hd, h)
    tensors[p + "self_attn.v_proj.weight"] = lin(kvh * hd, h)
    tensors[p + "self_attn.o_proj.weight"] = lin(h, nh * hd)
for i in (0, 1):
    p = f"model.layers.{i}."
    tensors[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
    tensors[p + "mlp.gate_proj.weight"] = lin(inter, h)
    tensors[p + "mlp.up_proj.weight"] = lin(inter, h)
    tensors[p + "mlp.down_proj.weight"] = lin(h, inter)
tensors["model.layers.2.input_layernorm.weight"] = np.ones(h, np.float32)
tensors["model.layers.2.self_attn.linear_attn.weight"] = lin(h, h)
tensors["model.layers.2.post_attention_layernorm.weight"] = np.ones(h, np.float32)
tensors["model.layers.2.mlp.linear_mlp.weight"] = lin(h, h)
cfg = dict(
    model_type="nemotron-nas", vocab_size=V, hidden_size=h,
    intermediate_size=inter, num_hidden_layers=4, num_attention_heads=nh,
    num_key_value_heads=2, rms_norm_eps=1e-6, max_position_embeddings=256,
    tie_word_embeddings=False,
    block_configs=[
        {"attention": {"n_heads_in_group": 2}, "ffn": {}},
        {"attention": {"no_op": True}, "ffn": {}},
        {"attention": {"replace_with_linear": True},
         "ffn": {"replace_with_linear": True}},
        {"attention": {"n_heads_in_group": 4}, "ffn": {"no_op": True}},
    ])
with tempfile.TemporaryDirectory() as tmp:
    d = Path(tmp) / "decilm"
    _write_ckpt(d, tensors, cfg)
    m = GPTQModel.load(str(d), QuantizeConfig(bits=4, group_size=16))
    m.quantize([np.array([1, 5, 9, 2, 7, 3, 8, 4] * 4, np.int32)] * 4)
    qdir = Path(tmp) / "q"
    m.save(str(qdir))
    toks = GPTQModel.load(str(qdir)).generate(
        np.array([[1, 5, 9, 2]], np.int32), max_new_tokens=4)
    log("decilm NAS e2e on-chip:", np.asarray(toks).tolist())

log("VERIFY OK")
