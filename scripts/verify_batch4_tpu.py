"""On-TPU verify: longcat_flash + mistral3/llava_onevision text towers."""
import tempfile
from pathlib import Path
import numpy as np
import jax
print("platform:", jax.devices(), flush=True)
import torch
from transformers import AutoConfig, AutoModelForCausalLM, AutoModelForImageTextToText
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
    rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)],
                      batch_size=4)
    gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
    print(f"OK longcat_flash: {len(rows)} modules, gen {gen.shape}", flush=True)

t64 = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
           num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
           max_position_embeddings=256, tie_word_embeddings=False)
with tempfile.TemporaryDirectory() as tmp:
    cfg = AutoConfig.for_model(
        model_type="llava_onevision", image_token_index=127,
        video_token_index=126,
        text_config=dict(model_type="qwen2", **t64),
        vision_config=dict(model_type="siglip_vision_model", hidden_size=32,
                           intermediate_size=64, num_hidden_layers=1,
                           num_attention_heads=2, image_size=28, patch_size=14),
    )
    torch.manual_seed(0)
    AutoModelForImageTextToText.from_config(cfg).to(torch.float32).eval(
    ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
    m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
    rng = np.random.default_rng(0)
    rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)],
                      batch_size=4)
    gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
    print(f"OK llava_onevision: {len(rows)} modules, gen {gen.shape}", flush=True)
print("ALL-OK", flush=True)
