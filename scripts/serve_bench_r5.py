"""Round-5 serve bench: the PIPELINED engine on the real chip.

VERDICT r4 #1: keep token/pos device-resident, dispatch block n+1 before
syncing block n — measure served tok/s vs the in-graph decode rate, and
decompose the host glue (pipelined step wall vs forced-serial step wall vs
device-only block time).

MODEL=llama (default): synthetic llama-8B GPTQ-4 (bench.py model).
MODEL=moe: qwen3-30B-A3B-shaped MoE, 32 layers (bench_moe.py model) —
VERDICT r4 #3 (the MoE flagship served through the continuous batcher).

Env: SERVE_DECODE_BLOCK (8), SERVE_SPEC_K (0), SERVE_MODEL, SERVE_OUT.
Every prompt bucket AND block-size variant in the workload is precompiled
before the timed region (r4 lesson: one uncompiled bucket inserts ~20 s
into the wall).
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine

MODEL = os.environ.get("SERVE_MODEL", "llama")
BLOCK = int(os.environ.get("SERVE_DECODE_BLOCK", "8"))
SPEC_K = int(os.environ.get("SERVE_SPEC_K", "0"))
OUT = os.environ.get(
    "SERVE_OUT",
    f"/root/repo/BENCH_SERVE{'_MOE' if MODEL == 'moe' else ''}_r05.json")

t0 = time.time()
if MODEL == "moe":
    from bench_moe import build_params, qwen3_30b_spec
    spec = qwen3_30b_spec(32)
    params = build_params(spec)
else:
    from bench import build_quant_params_on_device
    from gptqmodel_tpu.utils.testing import llama8b_spec
    spec = llama8b_spec(layers=32)
    params = build_quant_params_on_device(spec)
print(f"params built in {time.time()-t0:.0f}s", flush=True)

eng = ContinuousBatchingEngine(
    spec, params, max_slots=8, max_len=512, eos_token_id=None,
    kv_quant="int8", seed=0, decode_block=BLOCK, spec_k=SPEC_K)

rng = np.random.default_rng(0)
V = min(32000, spec.vocab_size - 1)

t0 = time.time()
# warm every program the timed region can touch: prompt buckets 16..256
# and block-size variants (tail trimming reaches n = BLOCK, 4, 2, 1)
for blen in (16, 32, 64, 128, 256):
    r = eng.submit(rng.integers(1, V, size=blen).tolist(), max_new_tokens=2)
    while not r.done:
        eng.step()
for mnt in (max(12, BLOCK + 4), 3, 2):
    r = eng.submit(rng.integers(1, V, size=16).tolist(), max_new_tokens=mnt)
    while not r.done:
        eng.step()
if SPEC_K > 0:
    # adaptive speculation can fall back to plain decode blocks mid-run —
    # compile THAT path too (r4 lesson: uncompiled programs inside the wall)
    eng._spec_cooldown = 10 ** 9
    for mnt in (max(12, BLOCK + 4), 3, 2):
        r = eng.submit(rng.integers(1, V, size=16).tolist(),
                       max_new_tokens=mnt)
        while not r.done:
            eng.step()
    eng._spec_cooldown = 0
    eng._spec_ema = None
eng.run_until_idle()
print(f"warmup/precompile in {time.time()-t0:.0f}s", flush=True)

# ---- timed mixed workload: 24 reqs, 8 slots, half sampled — same RECIPE
# as the r4 bench (lengths/samplers from the same distributions) and a
# DEDICATED rng so the workload is bit-identical across every r5 variant
# regardless of how much warmup each one runs
wrng = np.random.default_rng(42)
t_submit, lat, reqs = {}, {}, []
t_start = time.time()
for i in range(24):
    plen = int(wrng.choice([16, 32, 64, 128, 256]))
    gen = int(wrng.choice([32, 64, 96]))
    kw = ({} if i % 2 == 0 else
          dict(temperature=0.8, top_k=40, top_p=0.95))
    r = eng.submit(wrng.integers(1, V, size=plen).tolist(),
                   max_new_tokens=gen, **kw)
    t_submit[r.request_id] = time.time()
    reqs.append(r)
    if i >= 8:
        for d in eng.step():
            lat[d.request_id] = time.time() - t_submit[d.request_id]

steps = 0
while eng.has_work():
    done = eng.step()
    steps += 1
    now = time.time()
    for d in done:
        lat[d.request_id] = now - t_submit[d.request_id]
wall = time.time() - t_start
print(f"drain steps: {steps}", flush=True)

total_out = sum(len(r.output_ids) for r in reqs)
total_in = sum(len(r.prompt_ids) for r in reqs)
lats = sorted(lat.values())
p50 = lats[len(lats) // 2]
p99 = lats[min(len(lats) - 1, int(len(lats) * 0.99))]

# ---- steady-state decomposition: 8 long greedy requests, full slots
for _ in range(8):
    eng.submit(rng.integers(1, V, size=16).tolist(), max_new_tokens=400)
for _ in range(3):
    eng.step()  # admit + enter steady state

K = 30
t0 = time.time()
for _ in range(K):
    eng.step()
pipelined_step = (time.time() - t0) / K

# forced-serial (r4 behavior): sync the carries before each next dispatch
t0 = time.time()
for _ in range(K):
    eng.step()
    jax.block_until_ready(eng.token)
serial_step = (time.time() - t0) / K

# device-only block time: dispatch the SAME compiled block program
# back-to-back without any host processing; amortized wall = device time
state = (eng.params, eng.caches, eng.key_valid, eng.token, eng.pos,
         eng.tokbuf)
n = eng.decode_block if SPEC_K == 0 else None
cache = eng._decode_multi_cache if SPEC_K == 0 else eng._spec_multi_cache
nkey = max(cache.keys())
fn = cache[nkey]
knobs = (eng._base_key, jnp.uint32(10_000), jnp.asarray(eng.temp),
         jnp.asarray(eng.topk), jnp.asarray(eng.topp),
         jnp.asarray(eng.minp))
act = jnp.asarray(np.ones(eng.B, bool))
def run_block(st):
    if SPEC_K == 0:
        toks, lps, c, kv, tok, pos, tb = fn(st[0], st[1], st[2], st[3],
                                            st[4], st[5], *knobs)
    else:
        toks, cnt, lps, c, kv, tok, pos, tb = fn(
            st[0], st[1], st[2], st[3], st[4], st[5], act, *knobs)
    return (st[0], c, kv, tok, pos, tb), toks
(state, tk) = run_block(state)
jax.block_until_ready(tk)
t0 = time.time()
last = None
for _ in range(K):
    state, last = run_block(state)
jax.block_until_ready(last)
device_block = (time.time() - t0) / K

row = {
    "metric": (f"{'qwen3-30B-moe' if MODEL == 'moe' else 'llama3-8b'}-gptq4 "
               f"served tok/s/chip (24 mixed reqs, 8 slots), "
               f"decode_block={BLOCK}"
               + (f", spec_k={SPEC_K}" if SPEC_K else "")),
    "value": round(total_out / wall, 2),
    "unit": "tok/s",
    "total_output_tokens": total_out,
    "total_input_tokens": total_in,
    "wall_s": round(wall, 2),
    "p50_latency_s": round(p50, 2),
    "p99_latency_s": round(p99, 2),
    "steady_state": {
        "pipelined_step_s": round(pipelined_step, 4),
        "forced_serial_step_s": round(serial_step, 4),
        "device_block_s": round(device_block, 4),
        "tokens_per_block": nkey if SPEC_K == 0 else f"spec S={nkey}",
        "note": ("pipelined_step ~= device_block means the host is off "
                 "the critical path; forced_serial shows the r4-style "
                 "sync-before-dispatch cost on this tunnel"),
    },
}
print(json.dumps(row), flush=True)
Path(OUT).write_text(json.dumps(row, indent=1))
print("SERVE_BENCH_DONE", flush=True)
