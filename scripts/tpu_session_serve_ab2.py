"""Serve-path A/B round 2: decompose the scheduler block's per-step cost
vs the raw bench.py in-graph floor (5.78 ms/step at B=8 int8-KV).

Variants (each a FRESH engine so its jit cache retraces), interleaved in
one process:
  V0 stock greedy decode_n(8)            (with scatter hints, r5 edit)
  V1 + chosen_logprobs stubbed to zeros  (log_softmax [8,128k] cost)
  V2 + sample_tokens stubbed to argmax   (sampler-cond cost)
  V4 bench-style uniform-pos scan        (engine.make_decode_fn floor)
Remaining V2-vs-V4 delta ~= per-row scatter writes + per-row bias/key_valid
+ tokbuf bookkeeping.
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
import gptqmodel_tpu.inference.scheduler as sched
import gptqmodel_tpu.inference.sampling as samp
from gptqmodel_tpu.utils.testing import llama8b_spec

spec = llama8b_spec(layers=32)
t0 = time.time()
params = build_quant_params_on_device(spec)
print(f"params built in {time.time()-t0:.0f}s", flush=True)

rng = np.random.default_rng(0)

orig_lp = samp.chosen_logprobs
orig_st = samp.sample_tokens


def make_engine():
    eng = sched.ContinuousBatchingEngine(
        spec, params, max_slots=8, max_len=512, kv_quant="int8", seed=0,
        decode_block=8)
    for _ in range(8):
        eng.submit(rng.integers(1, 32000, size=16).tolist(),
                   max_new_tokens=400)
    for _ in range(4):
        eng.step()
    return eng


def timed(eng, reps=20):
    fn = eng._decode_multi_cache[8]
    knobs = (eng._base_key, jnp.uint32(50_000), jnp.asarray(eng.temp),
             jnp.asarray(eng.topk), jnp.asarray(eng.topp),
             jnp.asarray(eng.minp))
    st = (eng.params, eng.caches, eng.key_valid, eng.token, eng.pos,
          eng.tokbuf)
    out = fn(st[0], st[1], st[2], st[3], st[4], st[5], *knobs)
    jax.block_until_ready(out[0])
    best = 1e9
    for _ in range(3):
        st2 = (st[0],) + tuple(out[2:])
        t0 = time.time()
        last = None
        for _ in range(reps):
            o = fn(st2[0], st2[1], st2[2], st2[3], st2[4], st2[5], *knobs)
            st2 = (st2[0],) + tuple(o[2:])
            last = o[0]
        jax.block_until_ready(last)
        best = min(best, (time.time() - t0) / reps)
    return best


def v0():
    samp.chosen_logprobs, samp.sample_tokens = orig_lp, orig_st
    return timed(make_engine())


def v1():
    samp.chosen_logprobs = lambda lg, tk: jnp.zeros(
        tk.shape, jnp.float32)
    samp.sample_tokens = orig_st
    return timed(make_engine())


def v2():
    samp.chosen_logprobs = lambda lg, tk: jnp.zeros(tk.shape, jnp.float32)
    samp.sample_tokens = (
        lambda lg, key, t, k, p, m=None:
        jnp.argmax(lg, axis=-1).astype(jnp.int32))
    return timed(make_engine())


def v4():
    from gptqmodel_tpu.inference.engine import init_kv_cache, make_decode_fn
    decode = make_decode_fn(spec, jnp.bfloat16)
    B, T, L = 8, 16, 512
    caches = init_kv_cache(spec, B, L, jnp.bfloat16, kv_quant="int8")
    key_valid = jnp.zeros((B, L), bool).at[:, :T].set(True)
    token = jnp.ones((B,), jnp.int32)
    pos = jnp.full((B,), T, jnp.int32)

    @jax.jit
    def loop(params, token, pos, key_valid, caches):
        def body(carry, s):
            token, pos, key_valid, caches = carry
            logits, caches, key_valid = decode(
                params, token, pos, T + s, key_valid, caches)
            token = jnp.argmax(logits, axis=-1)
            return (token, pos + 1, key_valid, caches), token[0]
        carry, toks = jax.lax.scan(
            body, (token, pos, key_valid, caches), jnp.arange(8))
        return carry, toks.sum()

    carry, s0 = loop(params, token, pos, key_valid, caches)
    jax.block_until_ready(s0)
    best = 1e9
    for _ in range(3):
        c, last = carry, s0
        t0 = time.time()
        for _ in range(20):
            c, last = loop(params, *c[:1], *c[1:2], *c[2:3], *c[3:])
        jax.block_until_ready(last)
        best = min(best, (time.time() - t0) / 20)
    return best


for rep in range(2):
    a, b, c, e = v0(), v1(), v2(), v4()
    print(f"rep{rep}: stock {a*1000:.1f} | -logprob {b*1000:.1f} | "
          f"-sampler {c*1000:.1f} | uniform-pos floor {e*1000:.1f} ms "
          f"per block8", flush=True)
samp.chosen_logprobs, samp.sample_tokens = orig_lp, orig_st
print("AB2_DONE", flush=True)
