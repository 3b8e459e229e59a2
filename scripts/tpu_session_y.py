"""Session Y (round 3): decode-attention kernel win-or-cut at long KV spans
(VERDICT r3 item 8). Full llama-8B decode step at L ∈ {2048, 4096} filled
int8 KV, attention backend XLA vs the fused Pallas kernel, paired in one
process, min-of-3 in-graph differential, base repeated last for drift.
(L=8192 exceeds the kernel's VMEM span contract — supports() already
rejects it; the chunked prefill path is the long-context answer.)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

t_start = time.time()
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), f"[t+{time.time()-t_start:.0f}s]", flush=True)

from bench import build_quant_params_on_device, packed_model_bytes
from gptqmodel_tpu.inference.engine import (
    init_kv_cache, make_decode_fn, make_prefill_fn,
)
from gptqmodel_tpu.ops.registry import set_attention_backend
from gptqmodel_tpu.utils.testing import llama8b_spec

B, steps = 8, 64  # 64-step differential: 16-32 step runs swing with tunnel RPC jitter
spec = llama8b_spec(layers=32)
roofline_ms = packed_model_bytes(spec, 4, 128) / 819e9 * 1e3
params = build_quant_params_on_device(spec, 4, 128)
prefill = make_prefill_fn(spec, jnp.bfloat16)
decode = make_decode_fn(spec, jnp.bfloat16)


def run(L, backend):
    set_attention_backend(backend)
    try:
        T = min(L - 64, 1984)  # prefill temps OOM at T=4032; decode reads the full allocated span either way
        max_len = L
        b = B if L <= 2048 else 4  # L=4096: several live cache copies OOM at B=8
        caches = init_kv_cache(spec, b, max_len, jnp.bfloat16, kv_quant="int8")
        ids = jnp.asarray(np.ones((b, T), np.int32))
        lens = jnp.full((b,), T, jnp.int32)
        t0 = time.time()
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
        print(f"  [L={L} {backend}] compiled in {time.time()-t0:.0f}s", flush=True)
        best = None
        for r in range(3):
            t0 = time.time()
            float(warm(params, token, pos, key_valid, caches))
            tw = time.time() - t0
            t0 = time.time()
            float(timed(params, token, pos, key_valid, caches))
            tt = time.time() - t0
            st = (tt - tw) / steps
            print(f"  [L={L} {backend}] rep{r}: {st*1e3:.3f} ms/step", flush=True)
            best = st if best is None else min(best, st)
        return best
    finally:
        set_attention_backend("auto")


results = {}
for L in (2048, 4096):
    for backend in ("xla", "pallas", "xla"):
        key = f"L{L}_{backend}" if f"L{L}_{backend}" not in results else f"L{L}_{backend}2"
        print(f"=== {key} [t+{time.time()-t_start:.0f}s]", flush=True)
        results[key] = run(L, backend)

print("==== summary (min ms/step) ====", flush=True)
for k, v in results.items():
    print(f"{k:16s}: {v*1e3:.3f} ms/step", flush=True)
for L in (2048, 4096):
    x = min(results[f"L{L}_xla"], results[f"L{L}_xla2"])
    p = results[f"L{L}_pallas"]
    print(f"L={L}: pallas vs xla: {1e3*(p-x):+.3f} ms "
          f"({'WIN' if p < x else 'LOSS'})", flush=True)
print("SESSION_Y_DONE", flush=True)
