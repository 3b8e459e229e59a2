"""On-TPU verify: qwen3_next hybrid quantize -> generate (deltanet scan +
gated attention on chip)."""
import tempfile
from pathlib import Path
import numpy as np
import jax
print("platform:", jax.devices(), flush=True)
import torch
from transformers import AutoConfig, AutoModelForCausalLM
from gptqmodel_tpu import GPTQModel, QuantizeConfig

with tempfile.TemporaryDirectory() as tmp:
    cfg = AutoConfig.for_model(
        model_type="qwen3_next", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, linear_num_value_heads=4,
        linear_num_key_heads=2, linear_key_head_dim=8, linear_value_head_dim=8,
        linear_conv_kernel_dim=4, num_experts=2, num_experts_per_tok=1,
        moe_intermediate_size=32, shared_expert_intermediate_size=64,
        decoder_sparse_step=1, mlp_only_layers=[], norm_topk_prob=True,
        max_position_embeddings=256, tie_word_embeddings=False,
        layer_types=["linear_attention", "full_attention"],
    )
    torch.manual_seed(0)
    AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
    ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
    m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=8))
    rng = np.random.default_rng(0)
    rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)],
                      batch_size=4)
    gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
    print(f"OK qwen3_next: {len(rows)} modules, gen {gen.shape}", flush=True)
print("ALL-OK", flush=True)
