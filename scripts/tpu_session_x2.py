"""Session X2 (round 3, end-of-round): quant-throughput revalidation.

Round-3 changed kernels/dispatch around the quantize path (plane-split
rt, registry eligibility, review fixes); re-confirm the session-X result
(warm layer ~64-70 s at 8B shapes with the default mega solver) still
holds on the final tree.
"""
import logging, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO, format="%(message)s", stream=sys.stdout)
import numpy as np, jax
print("devices:", jax.devices(), flush=True)
import torch
from transformers import AutoConfig, AutoModelForCausalLM

work = "/root/stage3x"
os.makedirs(work, exist_ok=True)
src = work + "/llama8b_shape4"
if not os.path.exists(src + "/config.json"):
    cfg = AutoConfig.for_model(
        model_type="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=4, num_attention_heads=32,
        num_key_value_heads=8, max_position_embeddings=4096,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    AutoModelForCausalLM.from_config(cfg).to(torch.float16).eval().save_pretrained(
        src, safe_serialization=True, max_shard_size="2GB")
    print("model written", flush=True)

from gptqmodel_tpu import GPTQModel, QuantizeConfig

rng = np.random.default_rng(0)
calib = [rng.integers(1, 32000, size=(128,)) for _ in range(16)]
t0 = time.time()
m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=128, sym=True,
                                       pack_workers=2))
layer_t = []
last = [time.time()]

import gptqmodel_tpu.utils.observe as obs
orig = obs.layer_done if hasattr(obs, "layer_done") else None

rows = m.quantize(calib, batch_size=4)
total = time.time() - t0
per_layer = {}
for r in rows:
    per_layer.setdefault(r["layer"], 0.0)
    per_layer[r["layer"]] += float(r.get("solve_ms", 0) or 0) / 1e3
print(f"TOTAL quantize wall: {total:.1f}s for 4 layers "
      f"({total/4:.1f}s/layer incl cold compile)", flush=True)
for layer, st in sorted(per_layer.items()):
    print(f"  layer {layer}: solve {st:.1f}s", flush=True)
print("SESSION_X2_DONE", flush=True)
