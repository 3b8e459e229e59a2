"""On-chip verify (round 5): pipelined scheduler + rejection-sampling spec.

Tiny random model on the real TPU: (a) pipelined decode_block engine greedy
outputs must match the full-forward oracle under staggered admission;
(b) spec_k engine with a MIXED greedy/sampled batch: greedy row oracle-exact,
sampled row valid; (c) cancellation path. Prints VERIFY_OK at the end.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine
from gptqmodel_tpu.models.transformer import forward_logits
from gptqmodel_tpu.utils.testing import random_dense_params, tiny_spec

spec = tiny_spec(hidden=256, layers=2, heads=8, kv_heads=4, inter=512,
                 vocab=512)
params = random_dense_params(spec, seed=3)
params = jax.tree.map(lambda x: jnp.asarray(x), params)


def oracle(prompt, steps):
    seq = list(prompt)
    out = []
    for _ in range(steps):
        lg = np.asarray(forward_logits(
            spec, params, jnp.asarray([seq], dtype=jnp.int32)))
        nxt = int(np.argmax(lg[0, -1]))
        out.append(nxt)
        seq.append(nxt)
    return out


rng = np.random.default_rng(0)
base = rng.integers(1, 500, size=4)
p1 = np.tile(base, 3).tolist()
p2 = rng.integers(1, 500, size=9).tolist()

t0 = time.time()
eng = ContinuousBatchingEngine(spec, params, max_slots=2, max_len=128,
                               decode_block=4)
r1 = eng.submit(p1, max_new_tokens=10)
eng.step()
r2 = eng.submit(p2, max_new_tokens=7)
eng.run_until_idle()
print(f"[a] pipelined block engine drained in {time.time()-t0:.0f}s, "
      f"dispatches={eng._dispatches}", flush=True)
assert r1.output_ids == oracle(p1, 10), "r1 mismatch"
assert r2.output_ids == oracle(p2, 7), "r2 mismatch"
print("[a] greedy == oracle OK", flush=True)

t0 = time.time()
eng = ContinuousBatchingEngine(spec, params, max_slots=2, max_len=128,
                               spec_k=3, decode_block=2, seed=5)
rg = eng.submit(p1, max_new_tokens=10)
rs = eng.submit(p2, max_new_tokens=10, temperature=0.8, top_k=20)
eng.run_until_idle()
print(f"[b] spec mixed batch drained in {time.time()-t0:.0f}s, "
      f"dispatches={eng._dispatches}", flush=True)
assert rg.output_ids == oracle(p1, 10), "greedy-in-mixed mismatch"
assert len(rs.output_ids) == 10
assert all(0 <= t < spec.vocab_size for t in rs.output_ids)
print("[b] mixed spec OK", flush=True)

eng = ContinuousBatchingEngine(spec, params, max_slots=1, max_len=128,
                               decode_block=4)
rc = eng.submit(p1, max_new_tokens=40)
eng.step(); eng.step(); eng.step()
rc.cancel()
eng.run_until_idle()
assert rc.done and rc.finish_reason == "stop"
assert len(rc.output_ids) < 40
print("[c] cancel OK", flush=True)

print("VERIFY_OK", flush=True)
