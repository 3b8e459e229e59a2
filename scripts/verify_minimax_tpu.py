"""On-TPU verify: minimax hybrid quantize -> generate."""
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
        model_type="minimax", vocab_size=128, hidden_size=64,
        intermediate_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, num_local_experts=2,
        num_experts_per_tok=1, max_position_embeddings=256,
        tie_word_embeddings=False, block_size=256,
        layer_types=["linear_attention", "full_attention"],
    )
    torch.manual_seed(0)
    AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
    ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
    m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
    rng = np.random.default_rng(0)
    rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)],
                      batch_size=4)
    gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
    print(f"OK minimax: {len(rows)} modules, gen {gen.shape}", flush=True)
print("ALL-OK", flush=True)
