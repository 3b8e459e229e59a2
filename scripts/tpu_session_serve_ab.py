"""Serve-path A/B (round 5): where do the 24-req workload's ms go?

Interleaved same-process A/B (memory discipline): (a) decode_n(8) block all
greedy, (b) same with 4 sampled rows (pays the [B,V] full-sort sampler
branch), (c) prefill [1,256] cost, (d) per-step in-graph floor from
bench.py methodology for reference. All timed by repeated dispatch with a
single trailing sync (amortized wall ~= device time).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

from bench import build_quant_params_on_device
from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine
from gptqmodel_tpu.utils.testing import llama8b_spec

spec = llama8b_spec(layers=32)
t0 = time.time()
params = build_quant_params_on_device(spec)
print(f"params built in {time.time()-t0:.0f}s", flush=True)

eng = ContinuousBatchingEngine(
    spec, params, max_slots=8, max_len=512, kv_quant="int8", seed=0,
    decode_block=8)
rng = np.random.default_rng(0)
# fill all slots, greedy
for _ in range(8):
    eng.submit(rng.integers(1, 32000, size=16).tolist(), max_new_tokens=400)
for _ in range(4):
    eng.step()

fn = eng._decode_multi_cache[8]


def timed_block(temp, reps=20):
    knobs = (eng._base_key, jnp.uint32(50_000),
             jnp.asarray(temp), jnp.asarray(eng.topk + 40),
             jnp.asarray(eng.topp * 0 + 0.95), jnp.asarray(eng.minp))
    st = (eng.params, eng.caches, eng.key_valid, eng.token, eng.pos,
          eng.tokbuf)
    # warm
    toks, lps, c, kv, tok, pos, tb = fn(st[0], st[1], st[2], st[3], st[4],
                                        st[5], *knobs)
    jax.block_until_ready(toks)
    best = 1e9
    for _ in range(3):
        st2 = (st[0], c, kv, tok, pos, tb)
        t0 = time.time()
        last = None
        for _ in range(reps):
            toks2, lps2, c2, kv2, tok2, pos2, tb2 = fn(
                st2[0], st2[1], st2[2], st2[3], st2[4], st2[5], *knobs)
            st2 = (st2[0], c2, kv2, tok2, pos2, tb2)
            last = toks2
        jax.block_until_ready(last)
        best = min(best, (time.time() - t0) / reps)
    return best


greedy_t = np.zeros(8, np.float32)
mixed_t = np.zeros(8, np.float32)
mixed_t[1::2] = 0.8  # 4 sampled rows
allsamp_t = np.ones(8, np.float32) * 0.8

# interleaved A/B/A/B
for rep in range(2):
    a = timed_block(greedy_t)
    b = timed_block(mixed_t)
    c = timed_block(allsamp_t)
    print(f"rep{rep}: greedy block8 {a*1000:.1f} ms | mixed(4samp) "
          f"{b*1000:.1f} ms | all-sampled {c*1000:.1f} ms", flush=True)

# prefill cost at each bucket
for T in (16, 64, 256):
    Tb = T
    if (Tb, 1) not in eng._prefill_cache:
        eng._prefill_cache[(Tb, 1)] = eng._make_prefill(Tb, 1)
    pf = eng._prefill_cache[(Tb, 1)]
    ids = np.zeros((1, Tb), np.int32)
    ids[0] = rng.integers(1, 32000, size=Tb)
    args = (eng.params, eng.caches, eng.key_valid, eng.token, eng.pos,
            eng.tokbuf, jnp.asarray(ids),
            jnp.asarray(np.full(1, Tb, np.int32)),
            jnp.asarray(np.zeros(1, np.int32)),
            eng._base_key, jnp.uint32(60_000),
            jnp.asarray(np.zeros(1, np.float32)),
            jnp.asarray(np.zeros(1, np.int32)),
            jnp.asarray(np.ones(1, np.float32)),
            jnp.asarray(np.zeros(1, np.float32)))
    out = pf(*args)
    jax.block_until_ready(out[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        o = None
        for _ in range(10):
            o = pf(*args)
        jax.block_until_ready(o[0])
        best = min(best, (time.time() - t0) / 10)
    print(f"prefill[1,{Tb}]: {best*1000:.1f} ms", flush=True)

print("AB_DONE", flush=True)
