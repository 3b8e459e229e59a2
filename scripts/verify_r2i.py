"""On-chip verify for the r2i batch: canonical quantize->pack->forward,
fused sym rt kernel (GPTQ_TPU_RT_FUSED=1) vs XLA, and a tiny chatglm
checkpoint through the library surface (load -> quantize -> generate)."""

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GPTQ_TPU_RT_FUSED"] = "1"

import numpy as np

t0 = time.time()


def log(*a):
    print(f"[t+{time.time()-t0:5.0f}s]", *a, flush=True)


import jax
import jax.numpy as jnp

log("platform:", jax.devices())

# ---- 1. canonical quantize -> pack -> quantized forward ----
from gptqmodel_tpu.quantization.gptq import (
    accumulate_hessian, init_hessian, gptq_quantize,
)
from gptqmodel_tpu.ops.qlinear import make_quant_linear, qlinear_forward_xla
from gptqmodel_tpu.ops import registry

rng = np.random.default_rng(0)
W = rng.standard_normal((256, 512)).astype(np.float32) * 0.05
X = rng.standard_normal((1024, 512)).astype(np.float32)
H, n = init_hessian(512), jnp.int32(0)
H, n = accumulate_hessian(H, n, jnp.asarray(X))
res = gptq_quantize(W, H, bits=4, group_size=128, sym=True, nsamples=int(n))
p = make_quant_linear(Q=res.Q, scales=res.scales, zeros=res.zeros,
                      g_idx=res.g_idx, bias=None, bits=4, group_size=128,
                      sym=True, v1=True)
x = jnp.asarray(X[:8], dtype=jnp.bfloat16)
y_q = qlinear_forward_xla(p, x)
y_fp = x @ jnp.asarray(W.T, dtype=jnp.bfloat16)
rel = float(jnp.linalg.norm((y_q - y_fp).astype(jnp.float32))
            / jnp.linalg.norm(y_fp.astype(jnp.float32)))
log("canonical quantize rel err:", rel)
assert rel < 0.2, rel

# ---- 2. fused sym rt kernel vs XLA, on-chip, 2/4/8-bit ----
for bits in (2, 4, 8):
    K, N, g = 2048, 512, 128
    codes = rng.integers(0, 2 ** bits, size=(N, K), dtype=np.int64)
    scales = rng.uniform(0.005, 0.05, size=(K // g, N)).astype(np.float32)
    zeros = np.full((K // g, N), 2 ** (bits - 1), np.int64)
    m = registry.post_init_module(make_quant_linear(
        Q=codes, scales=scales, zeros=zeros, g_idx=None, bias=None,
        bits=bits, group_size=g, sym=True))
    assert m.rt_layout, bits
    xx = jnp.asarray(rng.standard_normal((8, K)), dtype=jnp.bfloat16)
    ref = np.asarray(qlinear_forward_xla(m, xx), np.float32)
    got = np.asarray(registry.qlinear_forward(m, xx), np.float32)
    r = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    log(f"fused sym rt {bits}-bit on-chip rel: {r:.2e}")
    assert r < 1.5e-2, (bits, r)

# ---- 3. tiny chatglm checkpoint through the library surface ----
import torch
from transformers import AutoConfig, AutoModelForCausalLM

from tests.test_model_breadth import _torch_sd, _write_ckpt  # reuse helpers
from gptqmodel_tpu import GPTQModel, QuantizeConfig

with tempfile.TemporaryDirectory() as tmp:
    cfg = AutoConfig.for_model(
        model_type="glm", vocab_size=128, hidden_size=64,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=256,
        rms_norm_eps=1e-6, attention_bias=True, tie_word_embeddings=False,
        pad_token_id=0)
    torch.manual_seed(0)
    tmodel = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
    sd = _torch_sd(tmodel)
    out = {
        "transformer.embedding.word_embeddings.weight":
            sd["model.embed_tokens.weight"],
        "transformer.encoder.final_layernorm.weight": sd["model.norm.weight"],
        "transformer.output_layer.weight": sd["lm_head.weight"],
    }
    for i in range(2):
        s, d = f"model.layers.{i}.", f"transformer.encoder.layers.{i}."
        out[d + "input_layernorm.weight"] = sd[s + "input_layernorm.weight"]
        out[d + "post_attention_layernorm.weight"] = (
            sd[s + "post_attention_layernorm.weight"])
        out[d + "self_attention.query_key_value.weight"] = np.concatenate(
            [sd[s + f"self_attn.{p}_proj.weight"] for p in "qkv"], axis=0)
        out[d + "self_attention.query_key_value.bias"] = np.concatenate(
            [sd[s + f"self_attn.{p}_proj.bias"] for p in "qkv"], axis=0)
        out[d + "self_attention.dense.weight"] = sd[s + "self_attn.o_proj.weight"]
        out[d + "mlp.dense_h_to_4h.weight"] = sd[s + "mlp.gate_up_proj.weight"]
        out[d + "mlp.dense_4h_to_h.weight"] = sd[s + "mlp.down_proj.weight"]
    glm_cfg = dict(
        model_type="chatglm", num_layers=2, padded_vocab_size=128,
        hidden_size=64, ffn_hidden_size=96, num_attention_heads=4,
        kv_channels=16, multi_query_attention=True, multi_query_group_num=2,
        layernorm_epsilon=1e-6, add_qkv_bias=True, seq_length=256,
        rope_ratio=1.0, tie_word_embeddings=False)
    ckpt = Path(tmp) / "chatglm"
    _write_ckpt(ckpt, out, glm_cfg)
    model = GPTQModel.load(str(ckpt), QuantizeConfig(bits=4, group_size=32))
    calib = [np.array([1, 5, 9, 2, 7, 3, 8, 4] * 4, np.int32)] * 4
    model.quantize(calib)
    qdir = Path(tmp) / "q"
    model.save(str(qdir))
    qm = GPTQModel.load(str(qdir))
    toks = qm.generate(np.array([[1, 5, 9, 2]], np.int32), max_new_tokens=6)
    log("chatglm e2e generate on-chip:", np.asarray(toks).tolist())

log("VERIFY OK")
