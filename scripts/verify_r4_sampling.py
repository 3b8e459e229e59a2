"""On-chip verify: device-side sampling in the continuous batching engine
(round-4 change) + the canonical quantize->pack->forward drive."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

# ---- canonical quantize -> pack -> quantized forward
from gptqmodel_tpu.quantization.gptq import (
    accumulate_hessian, init_hessian, gptq_quantize)
from gptqmodel_tpu.ops.qlinear import make_quant_linear, qlinear_forward_xla

rng = np.random.default_rng(0)
W = rng.standard_normal((256, 512)).astype(np.float32) * 0.05
X = rng.standard_normal((1024, 512)).astype(np.float32)
H, n = init_hessian(512), jnp.int32(0)
H, n = accumulate_hessian(H, n, jnp.asarray(X))
res = gptq_quantize(W, H, bits=4, group_size=128, sym=True, nsamples=int(n))
p = make_quant_linear(Q=res.Q, scales=res.scales, zeros=res.zeros,
                      g_idx=res.g_idx, bias=None, bits=4, group_size=128,
                      sym=True, v1=True)
x = jnp.asarray(X[:8], dtype=jnp.bfloat16)
y_q = qlinear_forward_xla(p, x)
y_fp = x @ jnp.asarray(W.T, dtype=jnp.bfloat16)
rel = float(jnp.linalg.norm((y_q - y_fp).astype(jnp.float32))
            / jnp.linalg.norm(y_fp.astype(jnp.float32)))
print("quantize->forward rel err:", rel, flush=True)
assert rel < 0.2

# ---- device-side sampling through the engine on chip
from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine
from gptqmodel_tpu.utils.testing import random_dense_params, tiny_spec

spec = tiny_spec(hidden=64, layers=2, heads=4, kv_heads=2, inter=128,
                 vocab=256)
params = random_dense_params(spec, seed=3)
outs = []
for it in range(2):
    eng = ContinuousBatchingEngine(spec, params, max_slots=2, max_len=96,
                                   seed=11)
    r1 = eng.submit([5, 6, 7], max_new_tokens=8, temperature=1.2, top_k=8)
    r2 = eng.submit([9, 10], max_new_tokens=8)  # greedy, same batch
    eng.run_until_idle()
    outs.append((r1.output_ids, r2.output_ids))
    print(f"iter {it}: stochastic={r1.output_ids} greedy={r2.output_ids}",
          flush=True)
assert outs[0] == outs[1], "same-seed device sampling must be deterministic"
eng = ContinuousBatchingEngine(spec, params, max_slots=2, max_len=96, seed=12)
g = eng.generate([9, 10], max_new_tokens=8)
assert g == outs[0][1], "greedy rows must be seed-independent"
print("device-side sampling on chip: OK", flush=True)
