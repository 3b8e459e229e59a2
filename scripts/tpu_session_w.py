"""Session W: per-layer quantization wall time after the transfer cuts
(device-resident W_cat, uint8 Q fetch, device-side loss sum + replay).

Session V3 showed the solve core is ~0.1 s device time at every llama-8B
shape — the old 178 s/layer was host<->device traffic. This drives the REAL
pipeline (GPTQModel.load().quantize()) on a 2-layer 8B-shaped checkpoint and
reports per-module solve durations + per-layer wall for comparison against
session T (warm layer ~178 s: gate|up 41 s, down 35 s, qkv 11 s, o 10 s).
"""
import logging, os, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO, format="%(message)s", stream=sys.stdout)
import numpy as np, jax
print("devices:", jax.devices(), flush=True)
import torch
from transformers import AutoConfig, AutoModelForCausalLM
tmp = tempfile.mkdtemp()
cfg = AutoConfig.for_model(
    model_type="llama", vocab_size=32000, hidden_size=4096,
    intermediate_size=14336, num_hidden_layers=2, num_attention_heads=32,
    num_key_value_heads=8, max_position_embeddings=4096,
    tie_word_embeddings=False)
torch.manual_seed(0)
AutoModelForCausalLM.from_config(cfg).to(torch.float16).eval().save_pretrained(
    tmp + "/m", safe_serialization=True)
from gptqmodel_tpu import GPTQModel, QuantizeConfig
rng = np.random.default_rng(0)
calib = [rng.integers(1, 32000, size=(128,)) for _ in range(16)]
m = GPTQModel.load(tmp + "/m", QuantizeConfig(
    bits=4, group_size=128, pack_workers=2))
t0 = time.time()
m.quantize(calib, batch_size=4)
print(f"### total wall {time.time()-t0:.1f}s", flush=True)
for row in m.quant_log:
    print({k: row[k] for k in ("layer", "module", "loss", "time_s")}, flush=True)
print("DONE", flush=True)
