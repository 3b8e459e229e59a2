"""Session Z (round 3): MoE decode time decomposition at HONEST routing.

bench_moe r3b measured 5.89 ms/step with only ~13 unique routed experts
(~1.4 GB streamed -> ~2.0 ms at the 700 GB/s wall) — something besides HBM
dominates. Hypotheses: (a) the slot grid's fixed per-step cost (S=72 bound
vs ~14 used slots), (b) XLA launch/elementwise overhead per layer,
(c) scatter/gather. Measured here kernel-only, in-graph (min-of-3):

  1. fused qmoe_mlp at S=72 (the bench bound) with 13 routed experts
  2. fused qmoe_mlp at S=24 (truncated bound, same plan)
  3. the 3-call path at S=72
  4. dense-parts-only estimate: same step without any MoE math
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from gptqmodel_tpu.ops import pack as packing
from gptqmodel_tpu.ops.pallas_qmoe import (
    StackedQuantExperts, build_slots, fuse_gate_up, qmoe_forward_sorted,
    qmoe_mlp_forward_sorted,
)

rng = np.random.default_rng(0)
bits, g = 4, 128
E, D, F = 128, 2048, 768
tokens, topk, bm = 8, 8, 8
M = tokens * topk


def stack(K, N):
    G = K // g
    G_pad = max(8, -(-G // 8) * 8)
    kq = jax.random.split(jax.random.PRNGKey(K * 7 + N), 1)[0]
    return StackedQuantExperts(
        qweight=jax.lax.bitcast_convert_type(
            jax.random.bits(kq, (E, K // (32 // bits), N), dtype=jnp.uint32),
            jnp.int32),
        scales=jnp.full((E, G_pad, N), 0.01, jnp.bfloat16),
        bits=bits, G=G, zero_const=8.0, in_features=K, out_features=N,
    )


gu = fuse_gate_up(stack(D, F), stack(D, F))
down = stack(F, D)

# 13-unique-expert routing like the honest bench measured
uniq = 13
routed = rng.choice(E, size=uniq, replace=False)
top_i = rng.choice(routed, size=(tokens, topk))
S_full = M // bm + min(E, M)  # 72 — the static bench bound
pos, ids, counts, order = build_slots(top_i, E, bm, S_full)
used = int((counts > 0).sum())
print(f"routed experts={uniq} used slots={used} S_full={S_full}", flush=True)
x = (rng.standard_normal((tokens, D)) * 0.5).astype(np.float32)
xs_np = np.zeros((S_full * bm, D), np.float32)
xs_np[pos] = x[order // topk]


def timed_layers(fn, w, tag, reps=50):
    """Scan fn over `reps` iterations in-graph; min-of-3 differential.

    Weights `w` pass through jit as ARGUMENTS — closing over them bakes
    them into the HLO as constants and blows the remote-compile body limit
    (HTTP 413, first session-Z attempt).
    """
    def loop_n(n, x0, w):
        def body(c, _):
            y = fn(c, w)
            return (y * 1e-3 + x0 * 1e-6).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, x0.astype(jnp.bfloat16), None, length=n)
        return c
    import functools
    x0 = jnp.asarray(xs_np[:fn.rows], jnp.bfloat16)
    short = jax.jit(functools.partial(loop_n, 5))
    long = jax.jit(functools.partial(loop_n, 5 + reps))
    short(x0, w).block_until_ready()
    long(x0, w).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); short(x0, w).block_until_ready()
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); long(x0, w).block_until_ready()
        tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / reps)
    print(f"{tag}: {best*1e6:.1f} us/call", flush=True)
    return best


ids_j, counts_j = jnp.asarray(ids), jnp.asarray(counts)

def fused_full(xs, w):
    gu, down = w
    return qmoe_mlp_forward_sorted(
        xs, ids_j, counts_j, gu, down, act="silu", bm=bm,
        out_dtype=jnp.bfloat16)
fused_full.rows = S_full * bm

S_small = 24 + M // bm  # 32 slots
ids_s, counts_s = jnp.asarray(ids[:S_small]), jnp.asarray(counts[:S_small])
assert int(counts[S_small:].sum()) == 0, "plan overflows the small bound"

def fused_small(xs, w):
    gu, down = w
    return qmoe_mlp_forward_sorted(
        xs, ids_s, counts_s, gu, down, act="silu", bm=bm,
        out_dtype=jnp.bfloat16)
fused_small.rows = S_small * bm

def three_call(xs, w):
    gu, down = w
    both = qmoe_forward_sorted(xs, ids_j, counts_j, gu, bm=bm,
                               out_dtype=jnp.bfloat16)
    inner = (jax.nn.silu(both[:, :F].astype(jnp.float32))
             * both[:, F:].astype(jnp.float32)).astype(jnp.bfloat16)
    return qmoe_forward_sorted(inner, ids_j, counts_j, down, bm=bm,
                               out_dtype=jnp.bfloat16)
three_call.rows = S_full * bm

t_fused = timed_layers(fused_full, (gu, down), "fused S=72 (13 experts)")
t_small = timed_layers(fused_small, (gu, down), "fused S=32 (13 experts)")
t_three = timed_layers(three_call, (gu, down), "3-call S=72 (13 experts)")

# pure weight-streaming floor at 13 experts: 13 * packed(3*D*F) bytes
pk = 3 * D * F * bits // 8 + 3 * D * F // g * 2
floor = uniq * pk / 700e9
print(f"13-expert streaming floor: {floor*1e6:.1f} us", flush=True)
print(f"slot-grid overhead estimate (S=72 vs S=32): "
      f"{(t_fused - t_small)*1e6:.1f} us for 40 empty slots", flush=True)
print("SESSION_Z_DONE", flush=True)
