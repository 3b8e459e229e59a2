import sys, pathlib, tempfile
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax
print('platform:', jax.devices(), flush=True)
import torch
from pathlib import Path
from transformers import AutoConfig, AutoModelForCausalLM
from gptqmodel_tpu import GPTQModel, QuantizeConfig

with tempfile.TemporaryDirectory() as tmp:
    cfg = AutoConfig.for_model(
        model_type="dbrx", vocab_size=128, d_model=64, n_heads=4, n_layers=2,
        max_seq_len=128, attn_config={"kv_n_heads": 2},
        ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 2, "moe_top_k": 1})
    torch.manual_seed(0)
    AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval().save_pretrained(
        Path(tmp) / "m", safe_serialization=True)
    m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=32))
    rng = np.random.default_rng(0)
    rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4)
    out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
    print(f"dbrx: {len(rows)} modules, generate {out.shape} OK", flush=True)
