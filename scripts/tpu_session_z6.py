"""Session Z6 (round 3): SMEM-plan kernel vs scalar-prefetch stall (Z5 follow-up)

Z4: e2e kernel w/ CONSTANT plan = 106 us; routing glue 'alone' = 23.7
(but its scatter outputs were only sum-consumed -> XLA may simplify);
whole serialized MoE block = 388. Variants, all min-min in-graph:

  A. whole block, scatter-built tok/w columns (status quo)   [= Z4 #3]
  B. whole block, MATMUL-built columns (no scatter: eq @ tok)
  C. whole block with CONSTANT top_i/top_w (plan ops run in-graph on
     constants — isolates router/topk dynamism from plan machinery)
  D. kernel with CONSTANT plan (Z4 #1 re-run for drift reference)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from gptqmodel_tpu.ops.pallas_qmoe import (
    StackedQuantExperts, build_slots, fuse_gate_up, plan_rows_jit,
    qmoe_mlp_e2e, qmoe_mlp_forward_e2e,
)
from gptqmodel_tpu.ops.pallas_qmatmul import _plane_permute_x

rng = np.random.default_rng(0)
bits, g = 4, 128
E, D, F = 128, 2048, 768
tokens, topk, bm = 8, 8, 8
M = tokens * topk
S = M // bm + min(E, M)
M_pad = S * bm


def stack(K, N):
    G = K // g
    G_pad = max(8, -(-G // 8) * 8)
    sc = np.zeros((E, G_pad, N), np.float32)
    sc[:, :G] = 0.01
    return StackedQuantExperts(
        qweight=jax.lax.bitcast_convert_type(
            jax.random.bits(jax.random.PRNGKey(K * 7 + N),
                            (E, K // (32 // bits), N), dtype=jnp.uint32),
            jnp.int32),
        scales=jnp.asarray(sc, jnp.bfloat16),
        bits=bits, G=G, zero_const=8.0, in_features=K, out_features=N,
    )


gu = fuse_gate_up(stack(D, F), stack(D, F))
down = stack(F, D)
router_w = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32) * 0.05,
                       jnp.bfloat16)

routed = rng.choice(E, size=13, replace=False)
top_i0 = rng.choice(routed, size=(tokens, topk))
top_w0 = rng.uniform(0.1, 1.0, (tokens, topk)).astype(np.float32)
pos0, ids0, counts0, order0 = build_slots(top_i0, E, bm, S)
tok0 = jnp.asarray(order0 // topk)
pos0j, ids0j, counts0j = map(jnp.asarray, (pos0, ids0, counts0))
w0 = jnp.asarray(top_w0.reshape(-1)[order0])
top_i0j = jnp.asarray(top_i0, jnp.int32)
top_w0j = jnp.asarray(top_w0)


def route(x):
    logits = (x @ router_w.T).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_w, top_i = jax.lax.top_k(probs, topk)
    return top_w / jnp.sum(top_w, axis=-1, keepdims=True), top_i


def block_tail(x, w, top_w, top_i, cols):
    gu, down = w
    flat_e = top_i.reshape(-1)
    ids, counts, row_pos = plan_rows_jit(flat_e, E, bm, S)
    tok_flat = jnp.arange(M, dtype=jnp.int32) // topk
    w_flat = top_w.reshape(-1).astype(jnp.float32)
    if cols == "scatter":
        tok_col = jnp.full((M_pad, 1), -1, jnp.int32).at[row_pos, 0].set(
            tok_flat)
        w_col = jnp.zeros((M_pad, 1), jnp.float32).at[row_pos, 0].set(w_flat)
    else:  # matmul-built: eq [M_pad, M] one-hot of row_pos
        eq = (jnp.arange(M_pad, dtype=jnp.int32)[:, None]
              == row_pos[None, :])
        eqf = eq.astype(jnp.float32)
        tok_col = (
            eqf @ tok_flat.astype(jnp.float32)
            - (1.0 - jnp.sum(eqf, axis=1))  # padding rows -> -1
        ).astype(jnp.int32)[:, None]
        w_col = (eqf @ w_flat)[:, None]
    n_used = jnp.sum(counts > 0, dtype=jnp.int32)[None]
    N8 = max(8, -(-tokens // 8) * 8)
    xp8 = jnp.zeros((N8, D), jnp.bfloat16).at[:tokens].set(
        x.astype(jnp.bfloat16))
    xp8 = _plane_permute_x(xp8, D, 32 // bits, bits)
    out = qmoe_mlp_e2e(
        xp8, ids, n_used, tok_col, w_col,
        gu.qweight, gu.scales, down.qweight, down.scales,
        bits=bits, G_gu=gu.G, G_d=down.G, F=F, bm=bm, zc=8.0, act="silu")
    return out[:tokens].astype(jnp.bfloat16)


import os


def variant_A(x, w):
    os.environ["GPTQ_TPU_QMOE_SMEM_PLAN"] = "0"
    tw, ti = route(x)
    return block_tail(x, w, tw, ti, "scatter")


def variant_F(x, w):
    # full dynamic routing through the SMEM-plan kernel (library path)
    gu, down = w
    tw, ti = route(x)
    flat_e = ti.reshape(-1)
    ids, counts, row_pos = plan_rows_jit(flat_e, E, bm, S)
    tok_flat = jnp.arange(M, dtype=jnp.int32) // topk
    w_flat = tw.reshape(-1).astype(jnp.float32)
    out = qmoe_mlp_forward_e2e(
        x, row_pos, tok_flat, w_flat, ids, counts, gu, down,
        act="silu", bm=bm)
    return out.astype(jnp.bfloat16)


def variant_B(x, w):
    tw, ti = route(x)
    return block_tail(x, w, tw, ti, "matmul")


def variant_C(x, w):
    return block_tail(x, w, top_w0j, top_i0j, "scatter")


def variant_D(x, w):
    gu, down = w
    return qmoe_mlp_forward_e2e(
        x, pos0j, tok0, w0, ids0j, counts0j, gu, down, act="silu", bm=bm
    ).astype(jnp.bfloat16)


def timed(fn, w, x0, tag, reps=2000, short=200):
    def loop_n(n, x0, w):
        def body(c, _):
            y = fn(c, w)
            return (y * 1e-3 + x0 * 1e-6).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, x0.astype(jnp.bfloat16), None, length=n)
        return c

    sfn = jax.jit(functools.partial(loop_n, short))
    lfn = jax.jit(functools.partial(loop_n, short + reps))
    sfn(x0, w).block_until_ready()
    lfn(x0, w).block_until_ready()
    ts, tl = [], []
    for _ in range(5):
        t0 = time.perf_counter(); sfn(x0, w).block_until_ready()
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); lfn(x0, w).block_until_ready()
        tl.append(time.perf_counter() - t0)
    best = (min(tl) - min(ts)) / reps
    print(f"{tag}: {best*1e6:.2f} us/call", flush=True)
    return best


x0 = jnp.asarray(rng.standard_normal((tokens, D)) * 0.5, jnp.bfloat16)
# correctness: A == B exactly
ya = np.asarray(variant_A(x0, (gu, down)), np.float32)
yb = np.asarray(variant_B(x0, (gu, down)), np.float32)
print("A vs B max abs diff:", float(np.abs(ya - yb).max()), flush=True)

os.environ["GPTQ_TPU_QMOE_SMEM_PLAN"] = "1"
yf = np.asarray(variant_F(x0, (gu, down)), np.float32)
os.environ["GPTQ_TPU_QMOE_SMEM_PLAN"] = "0"
ya2 = np.asarray(variant_A(x0, (gu, down)), np.float32)
print("F vs A max abs diff:", float(np.abs(yf - ya2).max()), flush=True)

timed(variant_A, (gu, down), x0, "A block, scalar-prefetch kernel")
os.environ["GPTQ_TPU_QMOE_SMEM_PLAN"] = "1"
timed(variant_F, (gu, down), x0, "F block, SMEM-plan kernel")
timed(variant_D, (gu, down), x0, "D kernel-only, constant plan (ref)")
print("SESSION_Z6_DONE", flush=True)
