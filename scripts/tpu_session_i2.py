"""TPU session I2: confirm gpt16 vs gpt32 K-tile on llama-8B decode.
Both param sets stay resident; strict A/B/A/B interleave, 64-step loops."""
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
    init_kv_cache, make_decode_fn, make_prefill_fn,
)
from gptqmodel_tpu.utils.testing import llama8b_spec

B, T, steps, max_len = 8, 128, 64, 256
spec = llama8b_spec(layers=32)
roof = 819.0e9 / packed_model_bytes(spec, 4, 128)

setups = {}
for name, gpt in (("A16", "16"), ("B32", "32")):
    os.environ["GPTQ_TPU_RT_GROUPS"] = gpt
    params = build_quant_params_on_device(spec, 4, 128)
    prefill = make_prefill_fn(spec, jnp.bfloat16)
    decode = make_decode_fn(spec, jnp.bfloat16)
    caches = init_kv_cache(spec, B, max_len, jnp.bfloat16, kv_quant="int8")
    ids = jnp.asarray(np.ones((B, T), np.int32))
    lens = jnp.full((B,), T, jnp.int32)
    logits, caches, key_valid = prefill(params, ids, lens, caches)
    logits.block_until_ready()
    token = jnp.argmax(logits, axis=-1)

    def make_loop(n, decode=decode):
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
                body, (token, pos, key_valid, caches), jnp.arange(n)
            )
            return toks.sum()
        return loop

    warm, timed = make_loop(4), make_loop(4 + steps)
    args = (params, token, lens, key_valid, caches)
    float(warm(*args)); float(timed(*args))
    setups[name] = (warm, timed, args)
    log(f"{name} ready [t+{time.time()-t_start:.0f}s]")

for rnd in range(6):
    line = [f"round {rnd}:"]
    for name in ("A16", "B32"):
        warm, timed, args = setups[name]
        t0 = time.time(); float(warm(*args)); t_w = time.time() - t0
        t0 = time.time(); float(timed(*args)); t_t = time.time() - t0
        st = (t_t - t_w) / steps
        line.append(f"{name} {st*1e3:.3f}ms ({(1/st)/roof*100:.1f}%)")
    log("  ".join(line), f"[t+{time.time()-t_start:.0f}s]")
log("DONE")
