"""Session Z7 (round 3): is it top_k, the plan ops, or the dependency?

Z6: SMEM-plan kernel == scalar-prefetch kernel (387 us both) at dynamic
routing; constant routing = 122. Variants (min-min, 2000-rep scans):

  A. dynamic routing, full block                      (ref, ~387)
  H. dynamic routing computed, but kernel inputs pass through
     where(pred-always-true, CONSTANT, computed) — keeps the dependency
     chain, removes nothing else. H fast -> not the dependency.
  I. A with iterative argmax topk (no XLA sort)
  J. A with the topk replaced by a FIXED top_i (router+softmax still run,
     sort gone) — isolates the sort exactly.
"""
import os
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

routed = rng.choice(E, size=13, replace=False)
top_i0 = rng.choice(routed, size=(tokens, topk))
top_i0j = jnp.asarray(top_i0, jnp.int32)


def tail(x, w, top_w, top_i):
    gu, down = w
    flat_e = top_i.reshape(-1)
    ids, counts, row_pos = plan_rows_jit(flat_e, E, bm, S)
    tok_flat = jnp.arange(M, dtype=jnp.int32) // topk
    w_flat = top_w.reshape(-1).astype(jnp.float32)
    out = qmoe_mlp_forward_e2e(
        x, row_pos, tok_flat, w_flat, ids, counts, gu, down,
        act="silu", bm=bm)
    return out.astype(jnp.bfloat16)


def variant_A(x, w):
    logits = (x @ router_w.T).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    tw, ti = jax.lax.top_k(probs, topk)
    tw = tw / jnp.sum(tw, axis=-1, keepdims=True)
    return tail(x, w, tw, ti)


def variant_H(x, w):
    logits = (x @ router_w.T).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    tw, ti = jax.lax.top_k(probs, topk)
    tw = tw / jnp.sum(tw, axis=-1, keepdims=True)
    # runtime-true predicate XLA cannot prove: keeps tw/ti in the chain
    pred = jnp.isfinite(probs.sum())
    ti = jnp.where(pred, top_i0j, ti)
    tw = jnp.where(pred, 0.125, tw)
    return tail(x, w, tw, ti)


def variant_I(x, w):
    from gptqmodel_tpu.models.transformer import _topk

    logits = (x @ router_w.T).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    tw, ti = _topk(probs, topk)
    tw = tw / jnp.sum(tw, axis=-1, keepdims=True)
    return tail(x, w, tw, ti)


def variant_J(x, w):
    logits = (x @ router_w.T).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    tw = jnp.take_along_axis(probs, top_i0j, axis=-1)  # gather, no sort
    tw = tw / jnp.sum(tw, axis=-1, keepdims=True)
    return tail(x, w, tw, top_i0j)


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


os.environ["GPTQ_TPU_ITER_TOPK"] = "1"
x0 = jnp.asarray(rng.standard_normal((tokens, D)) * 0.5, jnp.bfloat16)
timed(variant_A, (gu, down), x0, "A dynamic routing (lax.top_k)")
timed(variant_H, (gu, down), x0, "H dependency kept, values const")
timed(variant_I, (gu, down), x0, "I iterative argmax topk")
timed(variant_J, (gu, down), x0, "J fixed top_i (sort gone)")
print("SESSION_Z7_DONE", flush=True)
