"""On-chip correctness: fused slot-MLP kernel (qmoe_mlp) vs the 3-call
ragged path AND the dense XLA oracle, real Mosaic compile (round-3)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

from gptqmodel_tpu.ops import pack as packing
from gptqmodel_tpu.ops.pallas_qmoe import (
    StackedQuantExperts,
    build_slots,
    fuse_gate_up,
    qmoe_forward_sorted,
    qmoe_mlp_forward_sorted,
    qmoe_mlp_supported,
)

rng = np.random.default_rng(0)
bits, g = 4, 128
E, D, F = 8, 2048, 768  # qwen3-30B MoE shapes
tokens, topk, bm = 8, 8, 8


def make_expert(K, N):
    Q = rng.integers(0, 2**bits, size=(N, K), dtype=np.int32)
    G = K // g
    scales = (rng.random((G, N), np.float32) * 0.02 + 0.01).astype(np.float32)
    W = (Q.T - 8).astype(np.float32) * np.repeat(scales, g, axis=0)
    return packing.pack_qweight(np.ascontiguousarray(Q.T), bits), scales, W


def stack(K, N):
    exps = [make_expert(K, N) for _ in range(E)]
    G = K // g
    G_pad = max(8, -(-G // 8) * 8)
    s_pad = np.zeros((E, G_pad, N), np.float32)
    for i, e in enumerate(exps):
        s_pad[i, :G] = e[1]
    return StackedQuantExperts(
        qweight=jnp.asarray(np.stack([e[0] for e in exps])),
        scales=jnp.asarray(s_pad.astype(jnp.bfloat16)),
        bits=bits, G=G, zero_const=8.0, in_features=K, out_features=N,
    ), [e[2] for e in exps]


gate, gate_W = stack(D, F)
up, up_W = stack(D, F)
down, down_W = stack(F, D)
gu = fuse_gate_up(gate, up)
M_pad_probe = (tokens * topk // bm + E + 1) * bm
assert qmoe_mlp_supported(bits=bits, D=D, F=F, G_gu=gu.G, G_d=down.G,
                          M_pad=M_pad_probe, act="silu")

top_i = rng.integers(0, E, size=(tokens, topk))
x = (rng.standard_normal((tokens, D)) * 0.5).astype(np.float32)
max_slots = tokens * topk // bm + E + 1
pos, ids, counts, order = build_slots(top_i, E, bm, max_slots)
M_pad = max_slots * bm
xs_np = np.zeros((M_pad, D), np.float32)
xs_np[pos] = x[order // topk]
xs = jnp.asarray(xs_np, jnp.bfloat16)
ids_j, counts_j = jnp.asarray(ids), jnp.asarray(counts)

# 3-call path (already on-chip-validated in round 2)
both = qmoe_forward_sorted(xs, ids_j, counts_j, gu, bm=bm)
gacc, uacc = both[:, :F], both[:, F:]
inner = (jax.nn.silu(gacc) * uacc).astype(jnp.bfloat16)
y_ref3 = np.asarray(qmoe_forward_sorted(inner, ids_j, counts_j, down, bm=bm))

# fused kernel
y_fused = np.asarray(
    qmoe_mlp_forward_sorted(xs, ids_j, counts_j, gu, down, act="silu", bm=bm)
)
rel3 = np.linalg.norm(y_fused - y_ref3) / (np.linalg.norm(y_ref3) + 1e-9)
print(f"fused vs 3-call rel err: {rel3:.2e}", flush=True)
assert rel3 < 2e-2, rel3

# dense f32 oracle per sorted row
y_dense = np.zeros((M_pad, D), np.float32)
for s in range(max_slots):
    e = int(ids[s])
    c = int(counts[s])
    if c == 0:
        continue
    rows = xs_np[s * bm : s * bm + c]
    gpart = rows @ gate_W[e]
    upart = rows @ up_W[e]
    innr = (gpart / (1 + np.exp(-gpart))) * upart
    y_dense[s * bm : s * bm + c] = innr @ down_W[e]
reln = np.linalg.norm(y_fused - y_dense) / np.linalg.norm(y_dense)
print(f"fused vs dense-f32 oracle rel err: {reln:.2e}", flush=True)
assert reln < 2e-2, reln
print("VERIFY_QMOE_FUSED_OK", flush=True)
