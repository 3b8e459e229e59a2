"""Session SPEC (round 4): speculative decoding on chip at llama-8B shapes.

Two measurements:
1. verify-forward cost vs decode step: a [B, k+1] verify streams the same
   packed weights as a [B, 1] decode — the premise that drafts are ~free
   on weight-bound decode. Measured as in-graph scans, min-min.
2. end-to-end speculative_generate tok/s on a REPETITIVE prompt (drafts
   land) vs greedy_generate, host-driven (the tunnel's per-dispatch cost
   dominates both loops equally; report steps taken + per-step device
   times separately).

Synthetic packed weights (bench.py builder): throughput is value-
independent; acceptance is driven by argmax periodicity, which random
zero-weights give trivially (constant logits -> constant argmax -> the
n-gram continuation always matches), so the e2e run shows the MAXIMUM
acceptance regime; the exactness guarantee is CPU-tested.
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from bench import build_quant_params_on_device
from gptqmodel_tpu.inference.engine import (
    greedy_generate, init_kv_cache, make_decode_fn, make_prefill_fn)
from gptqmodel_tpu.inference.speculative import (
    make_verify_fn, speculative_generate)
from gptqmodel_tpu.utils.testing import llama8b_spec

spec = llama8b_spec(layers=32)
B, T, steps, max_len = 8, 128, 64, 512
params = build_quant_params_on_device(spec)
print("params built", flush=True)

prefill = make_prefill_fn(spec, jnp.bfloat16)
decode = make_decode_fn(spec, jnp.bfloat16)
verify = make_verify_fn(spec, jnp.bfloat16)
caches = init_kv_cache(spec, B, max_len, jnp.bfloat16)
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(1, 32000, size=(B, T)), jnp.int32)
lens = jnp.full((B,), T, jnp.int32)
logits, caches, key_valid = prefill(params, ids, lens, caches)
token = jnp.argmax(logits, -1)
# verify strips the threaded "pos" key from its cache output; normalize the
# prefill-produced caches to the same structure for the scan carry
caches = [{k: v for k, v in c.items() if k != "pos"} for c in caches]

for K1 in (1, 5, 9):
    toks0 = jnp.asarray(rng.integers(1, 32000, size=(B, K1)), jnp.int32)

    def loop_n(n, params, toks0, key_valid, caches):
        def body(carry, s):
            kv, c = carry
            lg, c, kv = verify(params, toks0, lens + s, T + s, kv, c)
            return (kv, c), lg[0, 0, 0]
        carry, xs = jax.lax.scan(body, (key_valid, caches), jnp.arange(n))
        return xs.sum()

    sfn = jax.jit(functools.partial(loop_n, 2))
    lfn = jax.jit(functools.partial(loop_n, 2 + steps))
    float(sfn(params, toks0, key_valid, caches))
    float(lfn(params, toks0, key_valid, caches))
    ts, tl = [], []
    for _ in range(5):
        t0 = time.time(); float(sfn(params, toks0, key_valid, caches))
        ts.append(time.time() - t0)
        t0 = time.time(); float(lfn(params, toks0, key_valid, caches))
        tl.append(time.time() - t0)
    ms = (min(tl) - min(ts)) / steps * 1e3
    print(f"verify K1={K1}: {ms:.3f} ms/step "
          f"({B * K1 / ms * 1e3:.0f} tok-positions/s)", flush=True)

# e2e: repetitive prompt, host-driven loops (tunnel dispatch identical)
base = rng.integers(1, 32000, size=8)
prompt = np.tile(base, (B, 6))  # 48-token repetitive prompts
t0 = time.time()
ref = greedy_generate(spec, params, prompt, max_new_tokens=64,
                      max_len=640)
t_greedy = time.time() - t0
t0 = time.time()
got, stats = speculative_generate(
    spec, params, prompt, max_new_tokens=64, k=4, max_len=2048)
t_spec = time.time() - t0
match = bool((np.asarray(ref) == got).all())
print(f"e2e greedy: {t_greedy:.1f}s (64 steps); spec: {t_spec:.1f}s "
      f"({stats['verify_steps']} verify steps, accept_rate "
      f"{stats['accept_rate']:.2f}, tokens/step "
      f"{stats['tokens_per_step']:.2f}); outputs match: {match}",
      flush=True)
print("SESSION_SPEC_DONE", flush=True)
