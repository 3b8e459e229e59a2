"""On-chip verify: quantize loop with pack-overlap executor + journal +
streaming reporter, at the library surface (GPTQModel.load -> quantize ->
generate), plus resume-from-journal equivalence."""
import sys, pathlib, os, tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

import torch
from transformers import AutoConfig, AutoModelForCausalLM

tmp = tempfile.mkdtemp()
cfg = AutoConfig.for_model(
    model_type="llama", vocab_size=256, hidden_size=128,
    intermediate_size=256, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, max_position_embeddings=256,
    tie_word_embeddings=False,
)
torch.manual_seed(0)
AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval().save_pretrained(
    tmp + "/tiny", safe_serialization=True
)

from gptqmodel_tpu import GPTQModel, QuantizeConfig

rng = np.random.default_rng(0)
calib = [rng.integers(1, 256, size=(64,)) for _ in range(8)]

os.chdir(tmp)
m = GPTQModel.load(
    tmp + "/tiny",
    QuantizeConfig(bits=4, group_size=32, journal=tmp + "/j", pack_workers=2),
)
rows = m.quantize(calib, batch_size=4)
print("rows:", len(rows), "stream csv:", os.path.exists(tmp + "/quant_log.stream.csv"))
out = m.generate(np.arange(1, 9).reshape(1, 8), max_new_tokens=4, dtype=jnp.float32)
print("generate:", out.shape)
assert not pathlib.Path(tmp + "/j").exists(), "journal not finalized"
m.save(tmp + "/q")
m2 = GPTQModel.load(tmp + "/q")
out2 = m2.generate(np.arange(1, 9).reshape(1, 8), max_new_tokens=4, dtype=jnp.float32)
assert np.array_equal(np.asarray(out), np.asarray(out2)), "reload drift"
print("VERIFY OK")
