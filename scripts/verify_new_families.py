"""On-TPU verify: quantize -> generate for the new model families
(apertus xIELU, bitnet sub-norms, hunyuan_v1_moe nested gate + shared_mlp,
dots1 sigmoid/noaux router, seed_oss/arcee)."""
import tempfile, sys
from pathlib import Path
import numpy as np
import jax, jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

import torch
from transformers import AutoConfig, AutoModelForCausalLM
from gptqmodel_tpu import GPTQModel, QuantizeConfig

CASES = [
    ("apertus", {}),
    ("bitnet", dict(hidden_act="relu2")),
    ("hunyuan_v1_moe", dict(num_experts=2, moe_topk=1, head_dim=16)),
    ("dots1", dict(n_routed_experts=4, num_experts_per_tok=2,
                   moe_intermediate_size=32, n_shared_experts=1,
                   first_k_dense_replace=1, n_group=2, topk_group=1,
                   routed_scaling_factor=1.5, norm_topk_prob=True,
                   head_dim=16, sliding_window=None)),
    ("seed_oss", dict(attention_bias=True, attention_out_bias=False, head_dim=16)),
    ("arcee", {}),
]

base = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, tie_word_embeddings=False)

for mt, over in CASES:
    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(model_type=mt, **{**base, **over})
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)],
                          batch_size=4)
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
        print(f"OK {mt}: {len(rows)} modules quantized, gen {gen.shape}",
              flush=True)
print("ALL-OK", flush=True)
