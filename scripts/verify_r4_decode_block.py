"""Verify (on-chip): canonical quantize->pack->forward drive + the new
decode_block fused-step scheduler path vs block=1 token parity."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
print('platform:', jax.devices(), flush=True)

from gptqmodel_tpu.quantization.gptq import accumulate_hessian, init_hessian, gptq_quantize
from gptqmodel_tpu.ops.qlinear import make_quant_linear, qlinear_forward_xla
rng = np.random.default_rng(0)
W = rng.standard_normal((256, 512)).astype(np.float32) * 0.05
X = rng.standard_normal((1024, 512)).astype(np.float32)
H, n = init_hessian(512), jnp.int32(0)
H, n = accumulate_hessian(H, n, jnp.asarray(X))
res = gptq_quantize(W, H, bits=4, group_size=128, sym=True, nsamples=int(n))
p = make_quant_linear(Q=res.Q, scales=res.scales, zeros=res.zeros, g_idx=res.g_idx,
                      bias=None, bits=4, group_size=128, sym=True, v1=True)
x = jnp.asarray(X[:8], dtype=jnp.bfloat16)
y_q = qlinear_forward_xla(p, x); y_fp = x @ jnp.asarray(W.T, dtype=jnp.bfloat16)
rel = float(jnp.linalg.norm((y_q-y_fp).astype(jnp.float32))/jnp.linalg.norm(y_fp.astype(jnp.float32)))
print('quantize->forward rel err:', rel, flush=True)
assert rel < 0.25

# --- decode_block on-chip parity (small dense model, bf16)
from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine
from gptqmodel_tpu.utils.testing import random_dense_params, tiny_spec
spec = tiny_spec(hidden=256, layers=4, heads=4, kv_heads=2, inter=512, vocab=512)
params = random_dense_params(spec, seed=3)
rr = np.random.default_rng(1)
prompts = [rr.integers(1, 500, size=int(s)).tolist() for s in (9, 17, 30)]
outs = {}
for blk in (1, 8):
    eng = ContinuousBatchingEngine(spec, params, max_slots=2, max_len=128,
                                   dtype=jnp.bfloat16, decode_block=blk, seed=7)
    reqs = [eng.submit(pr, max_new_tokens=m, **kw) for pr, m, kw in zip(
        prompts, (23, 11, 16),
        ({}, {}, dict(temperature=0.8, top_k=20, top_p=0.95)))]
    t0 = time.time(); eng.run_until_idle(); dt = time.time() - t0
    outs[blk] = [list(r.output_ids) for r in reqs]
    print(f'block={blk}: wall {dt:.2f}s outputs {[len(o) for o in outs[blk]]}', flush=True)
# greedy rows must match exactly across block sizes (different admission
# interleaving => sampled row may differ; greedy rows are key-independent)
assert outs[1][0] == outs[8][0], (outs[1][0], outs[8][0])
assert outs[1][1] == outs[8][1], (outs[1][1], outs[8][1])
assert len(outs[8][2]) == 16
print('VERIFY_R4_DECODE_BLOCK_OK', flush=True)
