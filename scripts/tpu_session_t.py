"""Session T: FULL-DEPTH stage-3 — 32-layer llama-8B-shaped quantization on
one chip with journal + pack overlap + streaming observability all on.

Proves the quantize loop at real scale end-to-end: memory stays bounded
(layer streaming + the round-2 lean Cholesky-of-inverse), the journal
persists each layer, the stream CSV exists mid-run, and the packed model
saves + reloads + decodes.
"""
import logging, os, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO, format="%(message)s", stream=sys.stdout)
import numpy as np, jax
print("devices:", jax.devices(), flush=True)
import torch
from transformers import AutoConfig, AutoModelForCausalLM

work = "/root/stage3"
os.makedirs(work, exist_ok=True)
src = work + "/llama8b_shape"
if not os.path.exists(src + "/config.json"):
    cfg = AutoConfig.for_model(
        model_type="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=32, num_attention_heads=32,
        num_key_value_heads=8, max_position_embeddings=4096,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    t0 = time.time()
    AutoModelForCausalLM.from_config(cfg).to(torch.float16).eval().save_pretrained(
        src, safe_serialization=True, max_shard_size="2GB")
    print(f"checkpoint written in {time.time()-t0:.0f}s", flush=True)

from gptqmodel_tpu import GPTQModel, QuantizeConfig
rng = np.random.default_rng(0)
calib = [rng.integers(1, 32000, size=(128,)) for _ in range(16)]
os.chdir(work)
m = GPTQModel.load(src, QuantizeConfig(
    bits=4, group_size=128, journal=work + "/journal", pack_workers=2))
t0 = time.time()
rows = m.quantize(calib, batch_size=4)
print(f"### quantized {len(rows)} modules in {time.time()-t0:.0f}s", flush=True)
print("stream csv mid-run rows:",
      sum(1 for _ in open(work + "/quant_log.stream.csv")), flush=True)
m.save(work + "/q4")
del m
m2 = GPTQModel.load(work + "/q4")
import jax.numpy as jnp
out = m2.generate(np.arange(1, 9).reshape(1, 8), max_new_tokens=8, dtype=jnp.bfloat16)
print("reloaded generate:", np.asarray(out).tolist(), flush=True)
print("DONE", flush=True)
