"""On-chip verify: packed ragged-MoE kernel correctness + A/B vs dense loop,
plus MPT quantize+generate."""
import sys, pathlib, tempfile, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax
print('platform:', jax.devices(), flush=True)
import jax.numpy as jnp
import torch
from transformers import AutoConfig, AutoModelForCausalLM
from gptqmodel_tpu import GPTQModel, QuantizeConfig
from gptqmodel_tpu.models.transformer import forward_logits

# --- MPT family on-chip
with tempfile.TemporaryDirectory() as tmp:
    cfg = AutoConfig.for_model(model_type="mpt", vocab_size=128, d_model=64,
                               n_layers=2, n_heads=4, max_seq_len=128)
    torch.manual_seed(0)
    AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval().save_pretrained(
        tmp + "/m", safe_serialization=True)
    m = GPTQModel.load(tmp + "/m", QuantizeConfig(bits=4, group_size=32))
    rng = np.random.default_rng(0)
    rows = m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4)
    out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
    print(f"mpt: {len(rows)} modules, generate {out.shape} OK", flush=True)

# --- qmoe: quantize tiny qwen3_moe, compare loop vs packed-ragged ON CHIP
with tempfile.TemporaryDirectory() as tmp:
    cfg = AutoConfig.for_model(
        model_type="qwen3_moe", vocab_size=128, hidden_size=128,
        intermediate_size=128, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, head_dim=32, num_experts=8,
        num_experts_per_tok=2, moe_intermediate_size=128,
        decoder_sparse_step=1, norm_topk_prob=True, mlp_only_layers=[],
        max_position_embeddings=256, tie_word_embeddings=False)
    torch.manual_seed(0)
    AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval().save_pretrained(
        tmp + "/m", safe_serialization=True)
    rng = np.random.default_rng(0)
    m = GPTQModel.load(tmp + "/m", QuantizeConfig(bits=4, group_size=128))
    m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)], batch_size=4)
    m.save(tmp + "/q")
    m2 = GPTQModel.load(tmp + "/q")
    ids = np.stack([rng.integers(1, 128, size=(16,)) for _ in range(2)])
    ref = np.asarray(forward_logits(m2.spec, m2.params, jnp.asarray(ids)))
    m2.optimize(fused_mlp=False)
    lp0 = m2.params["model"]["layers"][0]
    assert "experts_stacked_q" in lp0["mlp"], list(lp0["mlp"])
    got = np.asarray(forward_logits(m2.spec, m2.params, jnp.asarray(ids)))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    print("qmoe on-chip rel vs loop:", float(rel), flush=True)
    assert rel < 0.03, rel
print("qmoe + mpt on-chip verify OK", flush=True)
