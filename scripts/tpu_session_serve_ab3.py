"""Sampler A/B (round 5): full-sort vs candidate two-stage sampler inside
the real decode block, interleaved in one process. The serve decomposition
measured +1.24 ms/step when any row samples (the [8, 128k] sort)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

from bench import build_quant_params_on_device
import gptqmodel_tpu.inference.sampling as samp
import gptqmodel_tpu.inference.scheduler as sched
from gptqmodel_tpu.utils.testing import llama8b_spec

spec = llama8b_spec(layers=32)
t0 = time.time()
params = build_quant_params_on_device(spec)
print(f"params built in {time.time()-t0:.0f}s", flush=True)
rng = np.random.default_rng(0)


def make_engine(mode):
    samp._SAMPLER = mode
    eng = sched.ContinuousBatchingEngine(
        spec, params, max_slots=8, max_len=512, kv_quant="int8", seed=0,
        decode_block=8)
    for _ in range(8):
        eng.submit(rng.integers(1, 32000, size=16).tolist(),
                   max_new_tokens=400)
    for _ in range(4):
        eng.step()
    return eng


def timed(eng, temp, reps=20):
    fn = eng._decode_multi_cache[8]
    knobs = (eng._base_key, jnp.uint32(50_000), jnp.asarray(temp),
             jnp.asarray(eng.topk + 40), jnp.asarray(eng.topp * 0 + 0.95),
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


mixed = np.zeros(8, np.float32)
mixed[1::2] = 0.8
alls = np.ones(8, np.float32) * 0.8
greedy = np.zeros(8, np.float32)

eng_sort = make_engine("sort")
eng_cand = make_engine("candidates")
for rep in range(2):
    a = timed(eng_sort, mixed)
    b = timed(eng_cand, mixed)
    c = timed(eng_sort, alls)
    d = timed(eng_cand, alls)
    g = timed(eng_cand, greedy)
    print(f"rep{rep}: mixed sort {a*1000:.1f} vs cand {b*1000:.1f} | "
          f"all-samp sort {c*1000:.1f} vs cand {d*1000:.1f} | "
          f"cand greedy {g*1000:.1f} ms per block8", flush=True)

# output sanity: candidate engine emits valid tokens under sampling
eng = eng_cand
eng.temp[:] = mixed
r = eng.slots[1]
print("sanity tokens so far:", len(r.output_ids) if r else "n/a", flush=True)
print("AB3_DONE", flush=True)
