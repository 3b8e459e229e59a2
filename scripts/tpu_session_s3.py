"""Session S3: pack-overlap measured at the durations level (compile-immune).

durations["pack"] with workers=0 = inline host pack seconds; with workers=2
= residual wait at layer assembly. The difference is the per-run saving,
independent of the tunnel's remote-compile variance that swamped the
wall-clock A/B (session S: w0 1579s / w2 1706s / w0 999s)."""
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
for workers in (0, 2):
    m = GPTQModel.load(tmp + "/m", QuantizeConfig(
        bits=4, group_size=128, pack_workers=workers))
    t0 = time.time()
    m.quantize(calib, batch_size=4)
    print(f"### pack_workers={workers}: wall {time.time()-t0:.1f}s", flush=True)
    del m
print("DONE", flush=True)
