import sys, pathlib, tempfile
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax
print('platform:', jax.devices(), flush=True)
import torch
from pathlib import Path
from transformers import AutoConfig, AutoModelForCausalLM
from gptqmodel_tpu import GPTQModel, QuantizeConfig

for mt, over in [
    ("falcon_mamba", dict(state_size=8, conv_kernel=4, expand=2, time_step_rank=8,
                          use_bias=False, use_conv_bias=True)),
    ("mamba2", dict(state_size=16, conv_kernel=4, expand=2, num_heads=8,
                    head_dim=16, n_groups=2, chunk_size=8)),
    ("bamba", dict(intermediate_size=128, num_attention_heads=4,
                   num_key_value_heads=2, attn_layer_indices=[1],
                   mamba_n_heads=8, mamba_d_head=16, mamba_d_state=16,
                   mamba_n_groups=2, mamba_expand=2, mamba_chunk_size=8,
                   max_position_embeddings=256, pad_token_id=0)),
]:
    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(model_type=mt, vocab_size=128, hidden_size=64,
                                   num_hidden_layers=3 if mt == "bamba" else 2,
                                   tie_word_embeddings=False, **over)
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval().save_pretrained(
            Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4)
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
        print(f"{mt}: {len(rows)} modules, generate {out.shape} OK", flush=True)
print("mamba-family on-chip verify OK", flush=True)
