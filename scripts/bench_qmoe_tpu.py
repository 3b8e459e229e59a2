"""On-chip A/B: packed ragged-MoE kernel vs dense expert loop vs bf16 ragged.

Qwen3-MoE-30B-ish layer shape: hidden 2048, moe_inter 768, E=128, top-8,
B=8 decode tokens. In-graph timing (lax.fori_loop over repeated MoE blocks).
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
print('platform:', jax.devices(), flush=True)
from gptqmodel_tpu.ops import pack as packing
from gptqmodel_tpu.ops.pallas_qmoe import (
    StackedQuantExperts, plan_slots_jit, qmoe_forward_sorted)

E, D, F, TOPK, B = 128, 2048, 768, 8, 8
bits, g = 4, 128
rng = np.random.default_rng(0)

def make_stacked(K, N):
    Q = rng.integers(0, 16, size=(E, N, K), dtype=np.int32)
    G = K // g
    qws = np.stack([packing.pack_qweight(np.ascontiguousarray(Q[e].T), bits) for e in range(E)])
    G_pad = max(8, -(-G // 8) * 8)
    s = np.zeros((E, G_pad, N), np.float32)
    s[:, :G] = 0.01
    return StackedQuantExperts(
        qweight=jnp.asarray(qws), scales=jnp.asarray(s.astype(jnp.bfloat16)),
        bits=bits, G=G, zero_const=8.0, in_features=K, out_features=N), Q

gate, Qg = make_stacked(D, F)
up, _ = make_stacked(D, F)
down, _ = make_stacked(F, D)
x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
top_i = jnp.asarray(rng.integers(0, E, size=(B, TOPK)), jnp.int32)
top_w = jnp.asarray(rng.random((B, TOPK)), jnp.float32)

bm = 8
M = B * TOPK
S = -(-M // bm) + min(E, M)

def moe_packed(gate, up, down, x, top_i, top_w):
    flat_e = top_i.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    tok = order // TOPK
    ids, counts, pos = plan_slots_jit(flat_e[order], E, bm, S)
    xs = jnp.zeros((S * bm, D), jnp.bfloat16).at[pos].set(x[tok])
    gy = qmoe_forward_sorted(xs, ids, counts, gate, bm=bm)
    uy = qmoe_forward_sorted(xs, ids, counts, up, bm=bm)
    inner = (jax.nn.silu(gy) * uy).astype(jnp.bfloat16)
    y = qmoe_forward_sorted(inner, ids, counts, down, bm=bm)
    w = top_w.reshape(-1)[order]
    return jnp.zeros((B, D), jnp.float32).at[tok].add(y[pos] * w[:, None])

def timed(fn, *args, iters=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

jp = jax.jit(moe_packed)
t_packed = timed(jp, gate, up, down, x, top_i, top_w)
# distinct experts hit
nd = len(np.unique(np.asarray(top_i)))
bytes_routed = nd * (D*F*2 + F*D) * bits // 8  # gate+up+down packed
bytes_all = E * (D*F*2 + F*D) * bits // 8
print(f"packed ragged MoE layer: {t_packed*1e6:.0f} us; distinct experts {nd}/{E}", flush=True)
print(f"routed packed bytes {bytes_routed/1e6:.1f}MB @ {bytes_routed/t_packed/1e9:.0f} GB/s (all-experts would be {bytes_all/1e6:.0f}MB -> {bytes_all/819e9*1e6:.0f} us floor)", flush=True)
