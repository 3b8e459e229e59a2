"""Session X (round 3): quant-throughput re-measure after the round-2
transfer fix + whole-solve mega kernel (VERDICT r3 item 2).

4-layer llama-8B-shaped model (4096h / 14336i / 32000v), calib 16x128,
g128: quantize once with the default XLA-scan solver and once with
GPTQ_TPU_SOLVER=mega, in the same process (cold-compile amortized per
variant). Reports per-layer walls, per-module solve times, and the
cross-solver code agreement (mega must be quality-identical before it can
become the default)."""
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
    t0 = time.time()
    AutoModelForCausalLM.from_config(cfg).to(torch.float16).eval().save_pretrained(
        src, safe_serialization=True, max_shard_size="2GB")
    print(f"checkpoint written in {time.time()-t0:.0f}s", flush=True)

from gptqmodel_tpu import GPTQModel, QuantizeConfig
os.chdir(work)

def run(tag, solver):
    if solver:
        os.environ["GPTQ_TPU_SOLVER"] = solver
    else:
        os.environ.pop("GPTQ_TPU_SOLVER", None)
    rng = np.random.default_rng(0)
    calib = [rng.integers(1, 32000, size=(128,)) for _ in range(16)]
    m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=128, pack_workers=2))
    t0 = time.time()
    rows = m.quantize(calib, batch_size=4)
    total = time.time() - t0
    per_layer = {}
    for r in rows:
        per_layer.setdefault(r["layer"], []).append(r)
    print(f"\n=== {tag}: total {total:.0f}s ===", flush=True)
    for li, rs in sorted(per_layer.items()):
        mods = {r["module"].split(".")[-1]: r["time_s"] for r in rs}
        print(f"layer {li}: " + "  ".join(f"{k}={v:.1f}s" for k, v in mods.items()), flush=True)
    m.save(work + f"/q4_{tag}")
    del m
    return total, rows

t_xla, rows_xla = run("xla", "")
t_mega, rows_mega = run("mega", "mega")

# warm-layer estimate: layers 2..3 (0 pays compile, 1 may catch stragglers)
import json
def warm(rows):
    per_layer = {}
    for r in rows:
        per_layer.setdefault(r["layer"], 0.0)
        per_layer[r["layer"]] += r["time_s"]
    return per_layer

print("\nper-layer module-time sums (s):", flush=True)
print("  xla :", {k: round(v, 1) for k, v in sorted(warm(rows_xla).items())}, flush=True)
print("  mega:", {k: round(v, 1) for k, v in sorted(warm(rows_mega).items())}, flush=True)
loss_x = {(r["layer"], r["module"]): r["loss"] for r in rows_xla}
loss_m = {(r["layer"], r["module"]): r["loss"] for r in rows_mega}
ratios = [loss_m[k] / loss_x[k] for k in loss_x if loss_x[k] > 1e-9]
print(f"loss ratio mega/xla: min={min(ratios):.4f} max={max(ratios):.4f}", flush=True)

# code agreement between the two solver outputs
from safetensors.numpy import load_file
from gptqmodel_tpu.ops.pack import unpack_qweight
import glob
fx = sorted(glob.glob(work + "/q4_xla/*.safetensors"))
fm = sorted(glob.glob(work + "/q4_mega/*.safetensors"))
tx, tm = {}, {}
for f in fx: tx.update(load_file(f))
for f in fm: tm.update(load_file(f))
worst = 0.0
for k in tx:
    if k.endswith(".qweight"):
        a = unpack_qweight(tx[k], 4); b = unpack_qweight(tm[k], 4)
        frac = float((a != b).mean())
        worst = max(worst, frac)
print(f"mega vs xla code mismatch: worst module frac={worst:.6f}", flush=True)
print("SESSION_X_DONE", flush=True)
