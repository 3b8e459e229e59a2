"""On-chip verify: new model families quantize + generate on the TPU."""
import sys, pathlib, tempfile
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax
print('platform:', jax.devices(), flush=True)
import jax.numpy as jnp
import torch
from transformers import AutoConfig, AutoModelForCausalLM
from gptqmodel_tpu import GPTQModel, QuantizeConfig

for mt, over in [
    ("cohere", {}),
    ("glm4", dict(head_dim=16, attention_bias=True, pad_token_id=0)),
    ("olmo2", {}),
]:
    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(model_type=mt, vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            tie_word_embeddings=False, **over)
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval().save_pretrained(
            tmp + "/m", safe_serialization=True)
        m = GPTQModel.load(tmp + "/m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4)
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
        print(f"{mt}: {len(rows)} modules quantized, generate {out.shape} OK", flush=True)
print("model-breadth on-chip verify OK", flush=True)
