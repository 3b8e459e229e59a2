"""Session Z4 (round 3): MoE per-layer decode decomposition, min-min.

bench_moe (honest min-min) = 4.53 ms/step over a 2.17 ms floor at 13.2
routed experts -> ~74 us/layer of overhead. Where? Components timed as
in-graph scans (min-min over 5 host reps, 2000-iteration differential):

  1. e2e MoE kernel only (plan precomputed)           <- kernel overhead
  2. router matmul + top_k + plan_rows_jit + scatters <- routing glue
  3. 2) + e2e kernel (the whole MoE block)
  4. attention block only (qkv/rope/cache/attn/o at decode shape)
  5. full layer (norms + attn + MoE block)
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
    qmoe_mlp_forward_e2e,
)

rng = np.random.default_rng(0)
bits, g = 4, 128
E, D, F = 128, 2048, 768
tokens, topk, bm = 8, 8, 8
M = tokens * topk
S = M // bm + min(E, M)


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

# fixed honest plan (13 experts) for the kernel-only variant
routed = rng.choice(E, size=13, replace=False)
top_i0 = rng.choice(routed, size=(tokens, topk))
top_w0 = rng.uniform(0.1, 1.0, (tokens, topk)).astype(np.float32)
pos0, ids0, counts0, order0 = build_slots(top_i0, E, bm, S)
tok0 = jnp.asarray(order0 // topk)
pos0j, ids0j, counts0j = map(jnp.asarray, (pos0, ids0, counts0))
w0 = jnp.asarray(top_w0.reshape(-1)[order0])


def kernel_only(x, w):
    gu, down = w
    return qmoe_mlp_forward_e2e(
        x, pos0j, tok0, w0, ids0j, counts0j, gu, down, act="silu", bm=bm
    ).astype(jnp.bfloat16)


def routing_glue(x, w):
    # router + top_k + sort-free plan + tok/w columns — NO expert compute
    logits = (x @ router_w.T).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_w, top_i = jax.lax.top_k(probs, topk)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    flat_e = top_i.reshape(-1)
    ids, counts, row_pos = plan_rows_jit(flat_e, E, bm, S)
    tok_flat = jnp.arange(M, dtype=jnp.int32) // topk
    w_flat = top_w.reshape(-1).astype(jnp.float32)
    M_pad = S * bm
    tok_col = jnp.full((M_pad, 1), -1, jnp.int32).at[row_pos, 0].set(tok_flat)
    w_col = jnp.zeros((M_pad, 1), jnp.float32).at[row_pos, 0].set(w_flat)
    # consume everything so nothing is DCE'd
    mix = (tok_col.sum() + ids.sum() + counts.sum()).astype(jnp.float32)
    return x + (w_col.sum() + mix) * 1e-9


def moe_block(x, w):
    gu, down = w
    logits = (x @ router_w.T).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_w, top_i = jax.lax.top_k(probs, topk)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    flat_e = top_i.reshape(-1)
    ids, counts, row_pos = plan_rows_jit(flat_e, E, bm, S)
    tok_flat = jnp.arange(M, dtype=jnp.int32) // topk
    w_flat = top_w.reshape(-1).astype(jnp.float32)
    out = qmoe_mlp_forward_e2e(
        x, row_pos, tok_flat, w_flat, ids, counts, gu, down,
        act="silu", bm=bm)
    return out.astype(jnp.bfloat16)


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
pk = 3 * D * F * bits // 8 + 3 * D * F // g * 2
print(f"floor at 13 experts: {13*pk/700e9*1e6:.1f} us", flush=True)
t_k = timed(kernel_only, (gu, down), x0, "1 e2e kernel only (fixed plan)")
t_g = timed(routing_glue, (gu, down), x0, "2 routing glue only")
t_m = timed(moe_block, (gu, down), x0, "3 whole MoE block")
print(f"   glue+kernel = {1e6*(t_k+t_g):.2f} vs block {1e6*t_m:.2f}",
      flush=True)
print("SESSION_Z4_DONE", flush=True)
