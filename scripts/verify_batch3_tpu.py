"""On-TPU verify: ministral/olmo3/vaultgemma/flex_olmo/granitemoeshared +
glm4v text tower quantize -> generate."""
import tempfile
from pathlib import Path
import numpy as np
import jax
print("platform:", jax.devices(), flush=True)
import torch
from transformers import AutoConfig, AutoModelForCausalLM
from gptqmodel_tpu import GPTQModel, QuantizeConfig

t64 = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
           num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
           max_position_embeddings=256, tie_word_embeddings=False)
CASES = [
    ("ministral", dict(t64, sliding_window=8, head_dim=16,
                       layer_types=["sliding_attention", "full_attention"])),
    ("olmo3", dict(t64, sliding_window=8,
                   layer_types=["sliding_attention", "full_attention"])),
    ("vaultgemma", dict(t64, head_dim=16, query_pre_attn_scalar=16,
                        pad_token_id=0, sliding_window=8,
                        layer_types=["sliding_attention", "full_attention"])),
    ("flex_olmo", dict(t64, pad_token_id=0, num_experts=2,
                       num_experts_per_tok=1, norm_topk_prob=False)),
    ("granitemoeshared", dict(t64, num_local_experts=2, num_experts_per_tok=1,
                              shared_intermediate_size=64)),
]
for mt, over in CASES:
    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(model_type=mt, **over)
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
        rng = np.random.default_rng(0)
        rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)],
                          batch_size=4)
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
        print(f"OK {mt}: {len(rows)} modules, gen {gen.shape}", flush=True)

# glm4v text tower
from transformers import AutoModelForImageTextToText
with tempfile.TemporaryDirectory() as tmp:
    cfg = AutoConfig.for_model(
        model_type="glm4v", image_token_id=127, video_token_id=126,
        text_config=dict(model_type="glm4v_text", **t64, head_dim=16,
                         rope_scaling={"type": "default",
                                       "mrope_section": [2, 3, 3]}),
        vision_config=dict(hidden_size=32, intermediate_size=64, depth=2,
                           num_heads=2, image_size=28, patch_size=14,
                           out_hidden_size=64),
    )
    torch.manual_seed(0)
    AutoModelForImageTextToText.from_config(cfg).to(torch.float32).eval(
    ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
    m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
    rng = np.random.default_rng(0)
    rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)],
                      batch_size=4)
    gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
    print(f"OK glm4v: {len(rows)} modules, gen {gen.shape}", flush=True)
print("ALL-OK", flush=True)
