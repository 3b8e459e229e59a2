"""TPU session K: END-TO-END paired A/B of per-shape kernel configs.

The session-J microbench sweep is contaminated: configs whose packed weight
block layout leaves VMEM headroom let XLA pin the loop-invariant weight in
VMEM across the scan (readings of 1.2-1.7 TB/s on an 819 GB/s chip). A real
model (4+ GB) can never be pinned, so the only sound arbiter is the full
llama-8B decode step, all variants in ONE process, base repeated last to
measure chip drift.

Variant knobs ride the per-shape env maps (GPTQ_TPU_GROUPS_MAP /
GPTQ_TPU_BN_MAP, "KxN=v" / "N=v"); jax.clear_caches() between variants
forces re-trace so qmatmul re-reads the env.
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

B, T, steps, max_len = 8, 128, 32, 256
spec = llama8b_spec(layers=32)
pm_bytes = packed_model_bytes(spec, 4, 128)
roofline_ms = pm_bytes / 819e9 * 1e3

ENV_KEYS = ["GPTQ_TPU_RT_GROUPS", "GPTQ_TPU_BN", "GPTQ_TPU_GROUPS_MAP",
            "GPTQ_TPU_BN_MAP"]

VARIANTS = [
    ("base", {}),  # gpt=16, bn=2048 current defaults
    ("bn1024", {"GPTQ_TPU_BN": "1024"}),
    ("gpt8_bn1024", {"GPTQ_TPU_RT_GROUPS": "8", "GPTQ_TPU_BN": "1024"}),
    # per-shape: small-N projections (qkvo/kv) liked gpt=8/bn=1024 in the
    # sane microbench readings; gateup liked gpt=16/bn=1024
    ("pershape", {
        "GPTQ_TPU_GROUPS_MAP": "4096x4096=8,4096x1024=8,4096x14336=16,14336x4096=16",
        "GPTQ_TPU_BN_MAP": "4096=1024,1024=1024,14336=1024",
    }),
    ("base2", {}),  # drift gauge
]


def run_variant(name, env):
    for k in ENV_KEYS:
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
    logits.block_until_ready()
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
    args = (params, token, pos, key_valid, caches)
    float(warm(*args)); float(timed(*args))
    log(f"  [{name}] compiled in {time.time()-t0:.0f}s")
    best = None
    for rep in range(3):
        t0 = time.time(); float(warm(*args)); tw = time.time() - t0
        t0 = time.time(); float(timed(*args)); tt = time.time() - t0
        ms = (tt - tw) / steps * 1e3
        best = ms if best is None else min(best, ms)
        log(f"  [{name}] rep{rep}: {ms:.3f} ms/step "
            f"({roofline_ms/ms*100:.1f}% roofline)")
    del params, caches, args
    return best


results = {}
for name, env in VARIANTS:
    log(f"=== {name} {env} [t+{time.time()-t_start:.0f}s]")
    results[name] = run_variant(name, env)

log("==== summary (min ms/step) ====")
for name, ms in results.items():
    log(f"{name:14s}: {ms:.3f} ms/step  {roofline_ms/ms*100:.1f}% roofline")
log(f"drift base->base2: {results['base2']-results['base']:+.3f} ms")
log("DONE", f"[t+{time.time()-t_start:.0f}s]")
