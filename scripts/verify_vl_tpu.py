"""On-TPU verify: qwen2_vl text-tower quantize -> save -> reload -> generate."""
import tempfile
from pathlib import Path
import numpy as np
import jax
print("platform:", jax.devices(), flush=True)
import torch
from transformers.models.qwen2_vl import Qwen2VLConfig, Qwen2VLForConditionalGeneration
from gptqmodel_tpu import GPTQModel, QuantizeConfig

with tempfile.TemporaryDirectory() as tmp:
    cfg = Qwen2VLConfig(
        text_config=dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=256,
                         rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]}),
        vision_config=dict(depth=2, embed_dim=32, hidden_size=64, num_heads=2,
                           in_channels=3, spatial_merge_size=2, patch_size=14,
                           temporal_patch_size=2),
    )
    torch.manual_seed(0)
    Qwen2VLForConditionalGeneration(cfg).to(torch.float32).eval(
    ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
    m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
    rng = np.random.default_rng(0)
    rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)],
                      batch_size=4)
    m.save(Path(tmp) / "q")
    m2 = GPTQModel.load(Path(tmp) / "q")
    gen = m2.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
    print(f"OK qwen2_vl: {len(rows)} modules, gen {gen.shape}", flush=True)
print("ALL-OK", flush=True)
