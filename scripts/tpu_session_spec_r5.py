"""Honest on-chip speculative end-to-end artifact (VERDICT r4 #4).

Wall tok/s, spec vs greedy, with EVERY program precompiled before the
timed regions (the r4 e2e rows were compile-polluted). Two workloads on
the synthetic llama-8B GPTQ-4 model, 8 slots:
  (a) repetitive prompts (prompt-lookup's favorable case)
  (b) realistic mixed prompts (random ids -> low lookup hit rate)
Each timed with spec_k=0 and spec_k=4 (decode_block=4 both, so the RPC
amortization is identical and the delta is speculation alone).
Writes BENCH_SPEC_r05.json.
"""
import json
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

rng = np.random.default_rng(0)
base = rng.integers(1, 32000, size=16)
rep_prompts = [np.tile(base, 4).tolist() for _ in range(8)]  # 64 tokens
real_prompts = [rng.integers(1, 32000, size=64).tolist() for _ in range(8)]
GEN = 128


def make_engine(spec_k):
    eng = ContinuousBatchingEngine(
        spec, params, max_slots=8, max_len=1024, kv_quant="int8", seed=0,
        decode_block=4, spec_k=spec_k)
    # precompile: the 64-token prefill bucket + every reachable block size
    for mnt in (9, 3, 2):
        r = eng.submit(rng.integers(1, 32000, size=64).tolist(),
                       max_new_tokens=mnt)
        while not r.done:
            eng.step()
    eng.run_until_idle()
    return eng


def run(eng, prompts):
    reqs = [eng.submit(p, max_new_tokens=GEN) for p in prompts]
    t0 = time.time()
    steps = 0
    while eng.has_work():
        eng.step()
        steps += 1
    wall = time.time() - t0
    out = sum(len(r.output_ids) for r in reqs)
    assert all(len(r.output_ids) == GEN for r in reqs)
    return out / wall, steps, wall


engines = {0: make_engine(0), 4: make_engine(4)}  # compile once, reuse
results = {}
for name, prompts in (("repetitive", rep_prompts), ("realistic",
                                                    real_prompts)):
    row = {}
    for spec_k in (0, 4):
        toks, steps, wall = run(engines[spec_k], prompts)
        row[f"spec_k={spec_k}"] = {
            "tok_s": round(toks, 1), "scheduler_steps": steps,
            "wall_s": round(wall, 2)}
        print(f"{name} spec_k={spec_k}: {toks:.1f} tok/s "
              f"({steps} steps, {wall:.2f}s)", flush=True)
    row["speedup"] = round(
        row["spec_k=4"]["tok_s"] / row["spec_k=0"]["tok_s"], 3)
    results[name] = row

# exactness cross-check on chip: spec output == plain output (greedy)
o0 = engines[0].generate(rep_prompts[0], max_new_tokens=32)
o4 = engines[4].generate(rep_prompts[0], max_new_tokens=32)
results["greedy_exact"] = bool(o0 == o4)
print("greedy exact:", results["greedy_exact"], flush=True)

artifact = {
    "metric": "llama3-8b-gptq4 e2e wall tok/s, spec(k=4) vs greedy, "
              "8 slots x 128 new tokens, decode_block=4, precompiled",
    "results": results,
}
print(json.dumps(artifact), flush=True)
Path("/root/repo/BENCH_SPEC_r05.json").write_text(
    json.dumps(artifact, indent=1))
print("SPEC_BENCH_DONE", flush=True)
