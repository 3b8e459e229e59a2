"""TPU session S: pack-overlap A/B — quant wall-clock with pack_workers 0 vs 2.

Llama-8B-shaped (4096h/14336i) 4-layer synthetic checkpoint, calib 16x128,
GPTQ 4-bit g128. The overlap executor defers host packing (pack_qweight /
pack_qzeros over 218M params/layer) into worker threads that drain during
the remaining solves + replay (reference stage_layer.py:714-940 analog).
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, flush=True)


t_start = time.time()
import jax

log("devices:", jax.devices(), f"[t+{time.time()-t_start:.0f}s]")

import torch
from transformers import AutoConfig, AutoModelForCausalLM

tmp = tempfile.mkdtemp()
cfg = AutoConfig.for_model(
    model_type="llama", vocab_size=32000, hidden_size=4096,
    intermediate_size=14336, num_hidden_layers=4, num_attention_heads=32,
    num_key_value_heads=8, max_position_embeddings=4096,
    tie_word_embeddings=False,
)
torch.manual_seed(0)
t0 = time.time()
AutoModelForCausalLM.from_config(cfg).to(torch.float16).eval().save_pretrained(
    tmp + "/m", safe_serialization=True
)
log(f"checkpoint written in {time.time()-t0:.0f}s [t+{time.time()-t_start:.0f}s]")

from gptqmodel_tpu import GPTQModel, QuantizeConfig

rng = np.random.default_rng(0)
calib = [rng.integers(1, 32000, size=(128,)) for _ in range(16)]

results = {}
for workers in (0, 2, 0):
    key = f"w{workers}" + ("b" if f"w{workers}" in results else "")
    m = GPTQModel.load(tmp + "/m", QuantizeConfig(
        bits=4, group_size=128, pack_workers=workers))
    t0 = time.time()
    m.quantize(calib, batch_size=4)
    dt = time.time() - t0
    log(f"pack_workers={workers}: {dt:.1f}s total")
    results[key] = dt
    del m

log("==== summary ====")
for k, v in results.items():
    log(f"{k}: {v:.1f}s")
log(f"DONE [t+{time.time()-t_start:.0f}s]")
