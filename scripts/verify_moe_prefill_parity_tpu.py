"""On-chip multi-chunk MoE-prefill NUMERICAL parity (VERDICT r4 #4).

Round 3 validated the chunked e2e MoE prefill only in interpret mode at
multi-chunk sizes; the on-chip A/B covered timing. This runs the REAL
Mosaic kernel at Qwen3-30B layer shapes on the chip and asserts numerical
parity against the dense all-expert fallback:

- 8x1024 tokens (8192 rows -> 16 chunks of 512)
- 7777 rows (15 full chunks + 97-row ragged tail)
- 512 rows (single chunk, control)

Routing is per-token so chunk slicing is exact; any mismatch is a kernel
bug (r3's code review found exactly this class reachable only on chip).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

from gptqmodel_tpu.models.spec import ModelSpec
from gptqmodel_tpu.models import transformer as tr
from gptqmodel_tpu.ops.pallas_qmoe import StackedQuantExperts

bits, g, E, D, F, topk = 4, 128, 128, 2048, 768, 8

key = iter(jax.random.split(jax.random.PRNGKey(0), 64))


def stacked(K, N):
    G = K // g
    G_pad = max(8, -(-G // 8) * 8)
    pf = 32 // bits
    qw = jax.lax.bitcast_convert_type(
        jax.random.bits(next(key), (E, K // pf, N), dtype=jnp.uint32),
        jnp.int32)
    sc = jax.random.uniform(next(key), (E, G_pad, N), jnp.float32,
                            0.005, 0.02).astype(jnp.bfloat16)
    return StackedQuantExperts(qweight=qw, scales=sc, bits=bits, G=G,
                               zero_const=8.0, in_features=K, out_features=N)


spec = ModelSpec(model_type="qwen3_moe", vocab_size=1024, hidden_size=D,
                 intermediate_size=F, num_layers=1, num_heads=16,
                 num_kv_heads=4, head_dim=128, num_experts=E,
                 num_experts_per_tok=topk, moe_intermediate_size=F)
sq = {"gateup": stacked(D, 2 * F), "down": stacked(F, D)}


@jax.jit
def run_e2e(sq, x, top_w, top_i):
    return tr._moe_ragged_apply_q(spec, sq, x, top_w, top_i)


def run_dense(sq, x, top_w, top_i):
    return jax.jit(tr._moe_packed_dense_fallback, static_argnums=())(
        spec, sq, x, top_w, top_i)


for N in (512, 7777, 8192):
    rng = np.random.default_rng(N)
    x = jnp.asarray(rng.standard_normal((N, D)) * 0.5, jnp.bfloat16)
    top_i = jnp.asarray(
        np.stack([rng.permutation(E)[:topk] for _ in range(N)]), jnp.int32)
    tw = rng.uniform(0.1, 1.0, (N, topk)).astype(np.float32)
    tw /= tw.sum(1, keepdims=True)
    top_w = jnp.asarray(tw)
    t0 = time.time()
    y_e2e = np.asarray(run_e2e(sq, x, top_w, top_i), np.float32)
    t1 = time.time()
    y_dense = np.asarray(
        jax.jit(lambda sq, x, w, i: tr._moe_packed_dense_fallback(
            spec, sq, x, w, i))(sq, x, top_w, top_i), np.float32)
    t2 = time.time()
    rel = float(np.linalg.norm(y_e2e - y_dense)
                / (np.linalg.norm(y_dense) + 1e-9))
    mx = float(np.max(np.abs(y_e2e - y_dense)))
    nch = -(-N // 512)
    print(f"N={N} ({nch} chunks): rel={rel:.3e} max_abs={mx:.3e} "
          f"e2e {t1-t0:.1f}s dense {t2-t1:.1f}s", flush=True)
    assert rel < 2e-2, (N, rel)
print("on-chip multi-chunk MoE prefill parity: PASS", flush=True)
