"""Round-2 TPU session F: decode micro-levers A/B — block_n 2048, int8 KV
(re-test now that weights stream at 693 GB/s and attention is a bigger
fraction), and both combined."""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, flush=True)


t_start = time.time()
import jax
import jax.numpy as jnp

log("devices:", jax.devices(), f"[t+{time.time()-t_start:.0f}s]")

from bench import build_quant_params_on_device, packed_model_bytes
from gptqmodel_tpu.inference.engine import (
    init_kv_cache,
    make_decode_fn,
    make_prefill_fn,
)
from gptqmodel_tpu.utils.testing import llama8b_spec

spec = llama8b_spec(layers=32)
Bq, T, steps, max_len = 8, 128, 32, 256
params = build_quant_params_on_device(spec, 4, 128)
prefill = make_prefill_fn(spec, jnp.bfloat16)
decode = make_decode_fn(spec, jnp.bfloat16)
roof = 819e9 / packed_model_bytes(spec, 4, 128)
ids = jnp.asarray(np.ones((Bq, T), np.int32))
lens = jnp.full((Bq,), T, jnp.int32)


def run(tag, kv_quant):
    caches = init_kv_cache(spec, Bq, max_len, jnp.bfloat16, kv_quant=kv_quant)
    logits, caches, key_valid = prefill(params, ids, lens, caches)
    logits.block_until_ready()
    token = jnp.argmax(logits, axis=-1)
    pos = lens

    def make_loop(nsteps):
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

    warm, timed = make_loop(2), make_loop(2 + steps)
    args = (params, token, pos, key_valid, caches)
    float(warm(*args)); float(timed(*args))
    t0 = time.time(); float(warm(*args)); t_w = time.time() - t0
    t0 = time.time(); float(timed(*args)); t_t = time.time() - t0
    step_t = (t_t - t_w) / steps
    log(f"DECODE {tag}: {step_t*1e3:.2f} ms/step, {Bq/step_t:.0f} tok/s, "
        f"{(1/step_t)/roof*100:.1f}% roofline [t+{time.time()-t_start:.0f}s]")
    del caches
    gc.collect()
    return step_t


os.environ["GPTQ_TPU_BN"] = "2048"
run("bn2048 kv=bf16", False)
run("bn2048 kv=int8", "int8")
os.environ.pop("GPTQ_TPU_BN")
run("bn1024 kv=int8", "int8")
log(f"DONE [t+{time.time()-t_start:.0f}s]")
