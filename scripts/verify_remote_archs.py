"""On-TPU verify: exaone / minicpm3 / xverse / mimo constructed checkpoints
quantize -> generate."""
import json, tempfile
from pathlib import Path
import numpy as np
import jax
print("platform:", jax.devices(), flush=True)
import torch
from safetensors.numpy import save_file
from transformers import AutoConfig, AutoModelForCausalLM
from gptqmodel_tpu import GPTQModel, QuantizeConfig


def write(d, tensors, config):
    d.mkdir(parents=True, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              d / "model.safetensors", metadata={"format": "pt"})
    (d / "config.json").write_text(json.dumps(config))


def tiny(model_type, **over):
    base = dict(model_type=model_type, vocab_size=128, hidden_size=64,
                intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=256, tie_word_embeddings=False)
    base.update(over)
    cfg = AutoConfig.for_model(**base)
    torch.manual_seed(0)
    m = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
    return {k: v.numpy() for k, v in m.state_dict().items()}


with tempfile.TemporaryDirectory() as tmp:
    # exaone: llama sd renamed
    sd = tiny("llama", attention_bias=False)
    out = {"lm_head.weight": sd["lm_head.weight"],
           "transformer.wte.weight": sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"]}
    ren = {"input_layernorm.weight": "ln_1.weight",
           "post_attention_layernorm.weight": "ln_2.weight",
           "self_attn.q_proj.weight": "attn.attention.q_proj.weight",
           "self_attn.k_proj.weight": "attn.attention.k_proj.weight",
           "self_attn.v_proj.weight": "attn.attention.v_proj.weight",
           "self_attn.o_proj.weight": "attn.attention.out_proj.weight",
           "mlp.gate_proj.weight": "mlp.c_fc_0.weight",
           "mlp.up_proj.weight": "mlp.c_fc_1.weight",
           "mlp.down_proj.weight": "mlp.c_proj.weight"}
    for i in range(2):
        for canon, native in ren.items():
            out[f"transformer.h.{i}.{native}"] = sd[f"model.layers.{i}.{canon}"]
    write(Path(tmp) / "exaone", out, dict(
        model_type="exaone", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_layers=2, num_attention_heads=4,
        num_key_value_heads=2, layer_norm_epsilon=1e-6,
        activation_function="silu", max_position_embeddings=256,
        tie_word_embeddings=False))

    # minicpm3: deepseek_v2 all-dense MLA sd
    sd3 = tiny("deepseek_v2", q_lora_rank=24, topk_method="greedy",
               intermediate_size=96, moe_intermediate_size=32,
               num_key_value_heads=4, kv_lora_rank=16, qk_rope_head_dim=8,
               qk_nope_head_dim=8, v_head_dim=8, head_dim=8,
               n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
               first_k_dense_replace=2)
    write(Path(tmp) / "minicpm3", sd3, dict(
        model_type="minicpm3", vocab_size=128, hidden_size=64,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        q_lora_rank=24, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=8, v_head_dim=8, rms_norm_eps=1e-6,
        max_position_embeddings=256, tie_word_embeddings=False,
        scale_emb=1.0, scale_depth=float(2) ** 0.5, dim_model_base=64))

    for name in ("exaone", "minicpm3"):
        m = GPTQModel.load(Path(tmp) / name, QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)],
                          batch_size=4)
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
        print(f"OK {name}: {len(rows)} modules, gen {gen.shape}", flush=True)
print("ALL-OK", flush=True)
