"""TPU session L: projection-fusion A/B with sound (min-of-3) timing.

Session K showed tile configs are within chip drift; the step is limited by
kernel streaming BW (~700/819 GB/s). Fusion cuts launches (7->4 or 7->3 per
layer) and widens the worst-streaming small-N shapes (kv N=1024 -> qkv
N=6144). Earlier sessions called fused MLP "neutral" from single-shot
timing whose noise (±0.3 ms) exceeds the expected effect — re-measure
paired, one process, base repeated last for drift.
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
roofline_ms = packed_model_bytes(spec, 4, 128) / 819e9 * 1e3

VARIANTS = [
    ("base", None),          # per-projection
    ("fuse", "proj"),        # qkv + gate_up fused
    ("fuse+mlp", "mlp"),     # + single-kernel MLP
    ("base2", None),         # drift gauge
]


def run_variant(name, mode):
    jax.clear_caches()
    t0 = time.time()
    params = build_quant_params_on_device(spec, 4, 128)
    if mode in ("proj", "mlp"):
        from gptqmodel_tpu.models.optimize import fuse_projections

        params = fuse_projections(spec, params)
    if mode == "mlp":
        from gptqmodel_tpu.models.optimize import enable_fused_mlp

        params = enable_fused_mlp(spec, params)
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
for name, mode in VARIANTS:
    log(f"=== {name} [t+{time.time()-t_start:.0f}s]")
    results[name] = run_variant(name, mode)

log("==== summary (min ms/step) ====")
for name, ms in results.items():
    log(f"{name:10s}: {ms:.3f} ms/step  {roofline_ms/ms*100:.1f}% roofline")
log(f"drift base->base2: {results['base2']-results['base']:+.3f} ms")
log("DONE", f"[t+{time.time()-t_start:.0f}s]")
