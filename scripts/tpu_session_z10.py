"""Session Z10 (round 4): MoE e2e kernel at IID routing — overhead
decomposition + the slot-loop unroll A/B (VERDICT r4 #1/#2).

The r4 bench at representative routing (52.2 unique experts) measured
13.80 ms/step vs a 6.31 ms wall floor: ~234 us/layer of non-streaming
overhead, dominated by the ~4 us/slot serial chain latency (sessions
Z7-Z9). This measures, per layer, at BOTH routing regimes:

  U1/U2/U3      production kernel, unroll 1/2/3 (nbuf = max(3, 2U))
  PLAN          plan_rows_jit glue alone
  bm sweep      slots 8/16/32 at fixed bytes (8-expert routing) -> us/slot

All in-graph scans, min-min differential, one process, reference (U1)
timed first and last to bound chip drift.
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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
tokens, topk = 8, 8
M = tokens * topk


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
pk = 3 * D * F * bits // 8 + 3 * D * F // g * 2  # packed bytes/expert

x0 = jnp.asarray(rng.standard_normal((tokens, D)) * 0.5, jnp.bfloat16)



def routing(n_experts):
    """(row_pos, tok, w, ids, counts, used_slots) for given spread."""
    routed = rng.choice(E, size=n_experts, replace=False)
    if n_experts >= M:  # iid-style: distinct experts per token
        ti = np.stack([rng.choice(routed, size=topk, replace=False)
                       for _ in range(tokens)])
    else:
        ti = rng.choice(routed, size=(tokens, topk))
    tw = rng.uniform(0.1, 1.0, (tokens, topk)).astype(np.float32)
    return ti, tw


def plan(ti, tw, bm):
    flat_e = jnp.asarray(ti.reshape(-1), jnp.int32)
    S = -(-M // bm) + min(E, M) + 7
    ids, counts, row_pos = plan_rows_jit(flat_e, E, bm, S)
    tok_flat = jnp.arange(M, dtype=jnp.int32) // topk
    w_flat = jnp.asarray(tw.reshape(-1))
    used = int(np.sum(np.asarray(counts) > 0))
    uniq = len(np.unique(ti))
    return (row_pos, tok_flat, w_flat, ids, counts), used, uniq


# weights + plan arrays thread through jit as ARGUMENTS (413 closure trap)
WARGS = None  # set after gu/down exist


def timed(fn, args, tag, reps=600, short=60):
    def loop_n(n, x0, w, pargs):
        def body(c, _):
            y = fn(c, w, *pargs)
            return (c * jnp.bfloat16(0.999)
                    + y[:tokens, :].astype(jnp.bfloat16) * 1e-6), ()
        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c

    sfn = jax.jit(functools.partial(loop_n, short))
    lfn = jax.jit(functools.partial(loop_n, short + reps))
    sfn(x0, WARGS, args).block_until_ready()
    lfn(x0, WARGS, args).block_until_ready()
    ts, tl = [], []
    for _ in range(5):
        t0 = time.perf_counter(); sfn(x0, WARGS, args).block_until_ready()
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); lfn(x0, WARGS, args).block_until_ready()
        tl.append(time.perf_counter() - t0)
    best = (min(tl) - min(ts)) / reps
    print(f"{tag}: {best*1e6:.2f} us/layer", flush=True)
    return best * 1e6


WARGS = (gu.qweight, gu.scales, down.qweight, down.scales)

# ---- regime A: iid routing (the representative bench regime)
ti_iid, tw_iid = routing(E)
args_iid, used_iid, uniq_iid = plan(ti_iid, tw_iid, bm=8)
floor_iid = uniq_iid * pk / 700e9 * 1e6
print(f"IID: uniq={uniq_iid} used_slots={used_iid} "
      f"floor={floor_iid:.1f} us", flush=True)


import dataclasses


def kern(u, nbuf, bm=8):
    def f(c, w, row_pos, tok_flat, w_flat, ids, counts):
        gu_ = dataclasses.replace(gu, qweight=w[0], scales=w[1])
        dn_ = dataclasses.replace(down, qweight=w[2], scales=w[3])
        return qmoe_mlp_forward_e2e(
            c, row_pos, tok_flat, w_flat, ids, counts, gu_, dn_,
            act="silu", bm=bm, unroll=u, nbuf=nbuf)
    return f


def try_timed(fn, args, tag):
    try:
        return timed(fn, args, tag)
    except Exception as e:
        print(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:200]})", flush=True)
        return None

try_timed(kern(1, 3), args_iid, "IID U1 nbuf3 (r3 ref, first)")
try_timed(kern(2, 4), args_iid, "IID U2 nbuf4")
try_timed(kern(3, 6), args_iid, "IID U3 nbuf6")
try_timed(kern(4, 8), args_iid, "IID U4 nbuf8")
try_timed(kern(2, 6), args_iid, "IID U2 nbuf6 (deeper prefetch)")
try_timed(kern(1, 3), args_iid, "IID U1 nbuf3 (ref, last — drift check)")

# ---- plan glue alone
flat_iid = jnp.asarray(ti_iid.reshape(-1), jnp.int32)
S_iid = -(-M // 8) + min(E, M) + 7


def plan_only(c, w, *a):
    ids, counts, row_pos = plan_rows_jit(
        (flat_iid + c[0, 0].astype(jnp.int32) * 0) % E, E, 8, S_iid)
    return (row_pos[:, None] * jnp.float32(1e-9)) * jnp.ones((1, D))


timed(plan_only, (), "PLAN plan_rows_jit glue")

# ---- regime B: concentrated 8-expert routing, bm sweep -> us/slot slope
ti_c, tw_c = routing(8)
for bm_ in (8, 4, 2):
    args_c, used_c, uniq_c = plan(ti_c, tw_c, bm=bm_)
    fl = uniq_c * pk / 700e9 * 1e6
    try_timed(kern(1, 3, bm=bm_), args_c,
              f"CONC bm={bm_} slots={used_c} U1 (floor {fl:.1f})")
    try_timed(kern(2, 4, bm=bm_), args_c, f"CONC bm={bm_} slots={used_c} U2")

print("SESSION_Z10_DONE", flush=True)
