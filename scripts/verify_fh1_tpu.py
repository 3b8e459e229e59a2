"""On-TPU verify: falcon_h1 parallel hybrid quantize -> generate."""
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
        model_type="falcon_h1", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        tie_word_embeddings=False, mamba_d_ssm=64, mamba_n_heads=8,
        mamba_n_groups=2, mamba_d_state=16, mamba_d_conv=4, mamba_expand=1,
        embedding_multiplier=2.0, lm_head_multiplier=0.5, key_multiplier=0.9,
    )
    torch.manual_seed(0)
    AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
    ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
    m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
    rng = np.random.default_rng(0)
    rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)],
                      batch_size=4)
    gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
    print(f"OK falcon_h1: {len(rows)} modules, gen {gen.shape}", flush=True)
print("ALL-OK", flush=True)
