import sys, pathlib, tempfile
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax
print('platform:', jax.devices(), flush=True)
import torch
from pathlib import Path
from transformers import AutoConfig, AutoModelForCausalLM
from gptqmodel_tpu import GPTQModel, QuantizeConfig

CASES = [
    ("lfm2", dict(intermediate_size=128, num_hidden_layers=3,
                  num_attention_heads=4, num_key_value_heads=2, conv_L_cache=3,
                  layer_types=["conv", "full_attention", "conv"],
                  block_auto_adjust_ff_dim=False, max_position_embeddings=256)),
    ("granitemoehybrid", dict(intermediate_size=96, shared_intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              num_key_value_heads=2, num_local_experts=2,
                              num_experts_per_tok=1, layer_types=["mamba", "attention"],
                              mamba_n_heads=8, mamba_d_head=16, mamba_d_state=16,
                              mamba_n_groups=2, mamba_expand=2, mamba_chunk_size=8,
                              max_position_embeddings=256)),
    ("jamba", dict(intermediate_size=128, num_hidden_layers=2,
                   num_attention_heads=4, num_key_value_heads=2,
                   attn_layer_period=2, attn_layer_offset=1,
                   expert_layer_period=2, expert_layer_offset=0,
                   num_experts=2, num_experts_per_tok=1, mamba_d_state=8,
                   mamba_d_conv=4, mamba_expand=2, mamba_dt_rank=8,
                   use_mamba_kernels=False, max_position_embeddings=256)),
]
for mt, over in CASES:
    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(model_type=mt, vocab_size=128, hidden_size=64,
                                   tie_word_embeddings=False, **over)
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval().save_pretrained(
            Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4)
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=3)
        print(f"{mt}: {len(rows)} modules, generate {out.shape} OK", flush=True)
print("hybrid-arch on-chip verify OK", flush=True)
