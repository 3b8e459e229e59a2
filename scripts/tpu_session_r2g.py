"""Round-2 TPU session G: model-level verify at scale + remaining probes.

1. Quantize a ~0.3B synthetic llama ON-CHIP end-to-end (GPTQ + GAR + sym),
   save, reload through the rt/sym kernel path, compare perplexity vs the
   fp model and greedy tokens vs the XLA path (the verify-skill model-level
   drive, at scale).
2. tile32 + sym square-kernel probe (is there more beyond tile16?).
3. B=16 decode throughput datapoint with int8 KV.
"""

import gc
import json
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
import jax.numpy as jnp

log("devices:", jax.devices(), f"[t+{time.time()-t_start:.0f}s]")

# ------------------------------------------------- 1. at-scale model verify
from transformers import AutoConfig, AutoModelForCausalLM
import torch

with tempfile.TemporaryDirectory() as tmp:
    cfg = AutoConfig.for_model(
        model_type="llama", vocab_size=8192, hidden_size=1024,
        intermediate_size=2816, num_hidden_layers=12, num_attention_heads=8,
        num_key_value_heads=4, max_position_embeddings=2048,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    AutoModelForCausalLM.from_config(cfg).to(torch.bfloat16).eval().save_pretrained(
        tmp + "/src", safe_serialization=True
    )
    log(f"synthetic 0.3B written [t+{time.time()-t_start:.0f}s]")

    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    rng = np.random.default_rng(0)
    calib = [rng.integers(1, 8192, size=(512,)) for _ in range(16)]
    m = GPTQModel.load(
        tmp + "/src",
        QuantizeConfig(bits=4, group_size=128, act_group_aware=True),
    )
    rows = m.quantize(calib, batch_size=4)
    log(f"quantized {len(rows)} modules in looper [t+{time.time()-t_start:.0f}s]")
    m.save(tmp + "/q")

    m2 = GPTQModel.load(tmp + "/q")
    q0 = m2.params["model"]["layers"][0]["self_attn"]["q_proj"]
    log(f"reloaded: rt={q0.rt_layout} zero_const={q0.zero_const} "
        f"rt_bk={q0.rt_block_k}")

    eval_rows = np.stack([rng.integers(1, 8192, size=(256,)) for _ in range(8)])
    fp = GPTQModel.load(tmp + "/src")
    fp._load_params()
    ppl_fp = fp.perplexity(eval_rows, dtype=jnp.bfloat16)
    ppl_q = m2.perplexity(eval_rows, dtype=jnp.bfloat16)
    log(f"VERIFY ppl fp={ppl_fp:.3f} quant={ppl_q:.3f} "
        f"delta={(ppl_q-ppl_fp)/ppl_fp*100:.2f}% [t+{time.time()-t_start:.0f}s]")

    gen = m2.generate(np.arange(1, 9).reshape(1, 8), max_new_tokens=8)
    log(f"VERIFY generate: {gen.tolist()} [t+{time.time()-t_start:.0f}s]")
    del m, m2, fp
    gc.collect()

# ------------------------------------------------- 2. tile32 sym probe
os.environ["GPTQ_TPU_RT_GROUPS"] = "32"
from gptqmodel_tpu.ops import registry
from gptqmodel_tpu.ops.pallas_qmatmul import qmatmul
from gptqmodel_tpu.ops.qlinear import make_quant_linear

r = np.random.default_rng(0)
codes = r.integers(0, 16, size=(4096, 4096), dtype=np.int64)
scales = r.uniform(0.005, 0.05, size=(32, 4096)).astype(np.float16)
zeros = np.full((32, 4096), 8, np.int64)
mm = registry.post_init_module(make_quant_linear(
    Q=codes, scales=scales, zeros=zeros, g_idx=None, bias=None,
    bits=4, group_size=128, sym=True,
))
log(f"tile32 module rt_bk={mm.rt_block_k} zc={mm.zero_const}")
x0 = jnp.asarray(r.standard_normal((8, 4096)), jnp.bfloat16)


def make_loop(nit):
    @jax.jit
    def loop(x, qw, s, z):
        def body(c, _):
            y = qmatmul(c, qw, s, z, bits=4, group_size=128, rt=True,
                        rt_block_k=mm.rt_block_k, zero_const=mm.zero_const)
            c = c + y.astype(c.dtype) * jnp.asarray(1e-8, c.dtype)
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=nit)
        return jnp.sum(c.astype(jnp.float32))
    return loop


lo, hi = make_loop(100), make_loop(1100)
args = (x0, mm.qweight, mm.scales.astype(jnp.float32), mm.zvals)
float(lo(*args)); float(hi(*args))
dts = []
for _ in range(3):
    t0 = time.time(); float(lo(*args)); tl = time.time() - t0
    t0 = time.time(); float(hi(*args)); th = time.time() - t0
    dts.append((th - tl) / 1000)
dt = sorted(dts)[1]
log(f"TIME rt4-sym tile32 4096^2: {dt*1e6:.1f} us, "
    f"{4096*4096*0.5/dt/1e9:.0f} GB/s [t+{time.time()-t_start:.0f}s]")
del mm
gc.collect()
os.environ["GPTQ_TPU_RT_GROUPS"] = "16"

# ------------------------------------------------- 3. B=16 decode datapoint
from bench import build_quant_params_on_device, packed_model_bytes
from gptqmodel_tpu.inference.engine import (
    init_kv_cache,
    make_decode_fn,
    make_prefill_fn,
)
from gptqmodel_tpu.utils.testing import llama8b_spec

spec = llama8b_spec(layers=32)
Bq, T, steps, max_len = 16, 128, 32, 256
params = build_quant_params_on_device(spec, 4, 128)
prefill = make_prefill_fn(spec, jnp.bfloat16)
decode = make_decode_fn(spec, jnp.bfloat16)
caches = init_kv_cache(spec, Bq, max_len, jnp.bfloat16, kv_quant="int8")
ids = jnp.asarray(np.ones((Bq, T), np.int32))
lens = jnp.full((Bq,), T, jnp.int32)
logits, caches, key_valid = prefill(params, ids, lens, caches)
logits.block_until_ready()
token = jnp.argmax(logits, axis=-1)
pos = lens


def make_dloop(nsteps):
    @jax.jit
    def loop(params, token, pos, key_valid, caches):
        def body(carry, s):
            token, pos, key_valid, caches = carry
            lg, caches, key_valid = decode(
                params, token, pos, T + s, key_valid, caches
            )
            token = jnp.argmax(lg, axis=-1)
            return (token, pos + 1, key_valid, caches), token[0]
        (token, pos, key_valid, caches), toks = jax.lax.scan(
            body, (token, pos, key_valid, caches), jnp.arange(nsteps)
        )
        return toks.sum()
    return loop


warm, timed = make_dloop(2), make_dloop(2 + steps)
args = (params, token, pos, key_valid, caches)
float(warm(*args)); float(timed(*args))
t0 = time.time(); float(warm(*args)); t_w = time.time() - t0
t0 = time.time(); float(timed(*args)); t_t = time.time() - t0
step_t = (t_t - t_w) / steps
roof = 819e9 / packed_model_bytes(spec, 4, 128)
log(f"DECODE B=16 int8KV: {step_t*1e3:.2f} ms/step, {Bq/step_t:.0f} tok/s, "
    f"{(1/step_t)/roof*100:.1f}% step-roofline [t+{time.time()-t_start:.0f}s]")
log(f"DONE [t+{time.time()-t_start:.0f}s]")
