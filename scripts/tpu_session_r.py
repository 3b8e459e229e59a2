"""TPU session R: last traffic squeeze — bn=N (single n-block) per shape.

The ~700 GB/s consume-everything wall is fixed (session Q); the only lever
left is the ~4.7% non-weight traffic (x re-fetch per n-block + scales).
bn=N makes x stream once per k-tile instead of nc times. Paired in one
process, base repeated last for drift.
"""

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

B, T, steps, max_len = 8, 128, 64, 256  # 64-step differential (RPC jitter, r3)
spec = llama8b_spec(layers=32)
roofline_ms = packed_model_bytes(spec, 4, 128) / 819e9 * 1e3

VARIANTS = [
    ("base", {}),
    ("bnmax", {"GPTQ_TPU_BN_MAP": "4096x4096=4096,4096x1024=1024,"
                                   "4096x14336=2048,14336x4096=4096,"
                                   "4096x128256=2048"}),
    ("bnmax_g32", {"GPTQ_TPU_BN_MAP": "4096x4096=4096,14336x4096=4096",
                   "GPTQ_TPU_RT_GROUPS": "32"}),
    ("base2", {}),
]


def run_variant(name, env):
    for k in ("GPTQ_TPU_BN_MAP", "GPTQ_TPU_RT_GROUPS", "GPTQ_TPU_BN"):
        os.environ.pop(k, None)
    os.environ.update(env)
    jax.clear_caches()
    t0 = time.time()
    params = build_quant_params_on_device(spec, 4, 128)
    prefill = make_prefill_fn(spec, jnp.bfloat16)
    decode = make_decode_fn(spec, jnp.bfloat16)
    caches = init_kv_cache(spec, B, max_len, jnp.bfloat16, kv_quant="int8")
    ids = jnp.asarray(np.ones((B, T), np.int32))
    lens = jnp.full((B,), T, jnp.int32)
    logits, caches, key_valid = prefill(params, ids, lens, caches)
    token = jnp.argmax(logits, axis=-1)
    pos = lens

    def make_loop(n):
        @jax.jit
        def loop(params, token, pos, key_valid, caches):
            def body(carry, s):
                token, pos, key_valid, caches = carry
                logits, caches, key_valid = decode(
                    params, token, pos, T + s, key_valid, caches)
                token = jnp.argmax(logits, axis=-1)
                return (token, pos + 1, key_valid, caches), token[0]
            (token, pos, key_valid, caches), toks = jax.lax.scan(
                body, (token, pos, key_valid, caches), jnp.arange(n))
            return toks.sum()
        return loop

    warm, timed = make_loop(2), make_loop(2 + steps)
    float(warm(params, token, pos, key_valid, caches))
    float(timed(params, token, pos, key_valid, caches))
    log(f"  [{name}] compiled in {time.time()-t0:.0f}s")
    tws, tts = [], []
    for r in range(5):
        t0 = time.time()
        float(warm(params, token, pos, key_valid, caches))
        tws.append(time.time() - t0)
        t0 = time.time()
        float(timed(params, token, pos, key_valid, caches))
        tts.append(time.time() - t0)
    st = (min(tts) - min(tws)) / steps  # min-min: one-sided jitter immune
    log(f"  [{name}] min-min: {st*1e3:.3f} ms/step ({roofline_ms/st/1e3*100:.1f}%)")
    return st


results = {}
for ipass in range(2):  # interleaved double pass: drift hits all variants
    for name, env in VARIANTS:
        log(f"=== {name} pass{ipass} {env} [t+{time.time()-t_start:.0f}s]")
        st = run_variant(name, env)
        results[name] = min(results.get(name, 1e9), st)

log("==== summary (min ms/step) ====")
for name, st in results.items():
    log(f"{name:10s}: {st*1e3:.3f} ms/step  {roofline_ms/st/1e3*100:.1f}% roofline")
log(f"drift base->base2: {1e3*(results['base2']-results['base']):+.3f} ms")
log(f"DONE [t+{time.time()-t_start:.0f}s]")
