"""Session Z13 (round 4): rt DOWN projection (sub-group segments) on chip.

Z12 left ~22 us/layer in-kernel: down's per-element (w-z)*s dequant + the
perm dot. rt down removes both (the contract cuts 64-lane segments at
group boundaries — K=768, g=128: 128+64 per part). A/B at iid routing,
production wrapper, weights as jit args, min-min.
"""
import dataclasses
import functools
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
    StackedQuantExperts, plan_rows_jit, qmoe_mlp_forward_e2e,
)

rng = np.random.default_rng(0)
bits, g = 4, 128
E, D, F = 128, 2048, 768
tokens, topk, bm = 8, 8, 8
M = tokens * topk


def stack_pair(K, N):
    pf = 32 // bits
    G = K // g
    G_pad = max(8, -(-G // 8) * 8)
    qws = rng.integers(-2**31, 2**31, size=(E, K // pf, N),
                       dtype=np.int64).astype(np.int32)
    sc = np.zeros((E, G_pad, N), np.float32)
    sc[:, :G] = rng.random((E, G, N)).astype(np.float32) * 0.01 + 0.005
    kw = dict(bits=bits, G=G, zero_const=8.0, in_features=K, out_features=N)
    ic = StackedQuantExperts(qweight=jnp.asarray(qws),
                             scales=jnp.asarray(sc, jnp.bfloat16), **kw)
    perm = packing.rt_row_permutation(K, bits, K)
    qws_rt = np.stack([
        packing._pack_axis0_np(
            packing._unpack_axis0_np(qws[e], bits)[perm], bits)
        for e in range(E)
    ])
    rt = StackedQuantExperts(qweight=jnp.asarray(qws_rt),
                             scales=jnp.asarray(sc, jnp.bfloat16), rt=True,
                             **kw)
    return ic, rt


gu_ic, gu_rt = stack_pair(D, 2 * F)
down_ic, down_rt = stack_pair(F, D)
pk = 3 * D * F * bits // 8 + 3 * D * F // g * 2

ti = np.stack([rng.choice(E, size=topk, replace=False) for _ in range(tokens)])
tw = rng.uniform(0.1, 1.0, (tokens, topk)).astype(np.float32)
flat_e = jnp.asarray(ti.reshape(-1), jnp.int32)
S = -(-M // bm) + min(E, M)
ids_j, counts_j, row_pos = plan_rows_jit(flat_e, E, bm, S)
uniq = len(np.unique(ti))
print(f"uniq={uniq} floor={uniq*pk/700e9*1e6:.1f} us", flush=True)
tok_flat = jnp.arange(M, dtype=jnp.int32) // topk
w_flat = jnp.asarray(tw.reshape(-1))
pargs = (row_pos, tok_flat, w_flat, ids_j, counts_j)

x0 = jnp.asarray(rng.standard_normal((tokens, D)) * 0.5, jnp.bfloat16)


def fwd(c, w, rt_d):
    gu = dataclasses.replace(gu_rt, qweight=w[0], scales=w[1])
    dn = dataclasses.replace(down_rt if rt_d else down_ic,
                             qweight=w[2], scales=w[3])
    return qmoe_mlp_forward_e2e(c, *pargs, gu, dn, act="silu", bm=bm)


W_IC = (gu_rt.qweight, gu_rt.scales, down_ic.qweight, down_ic.scales)
W_RT = (gu_rt.qweight, gu_rt.scales, down_rt.qweight, down_rt.scales)

y_ic = np.asarray(jax.jit(lambda c, w: fwd(c, w, False))(x0, W_IC),
                  np.float32)
y_rt = np.asarray(jax.jit(lambda c, w: fwd(c, w, True))(x0, W_RT),
                  np.float32)
rel = float(np.linalg.norm(y_rt - y_ic) / (np.linalg.norm(y_ic) + 1e-9))
print(f"down-rt vs down-ic rel={rel:.3e}", flush=True)
assert rel < 5e-3, rel


def timed(rt_d, w, tag, reps=600, short=60):
    def loop_n(n, x0, w):
        def body(c, _):
            y = fwd(c, w, rt_d)
            return (c * jnp.bfloat16(0.999)
                    + y[:tokens, :].astype(jnp.bfloat16) * 1e-6), ()
        c, _ = jax.lax.scan(body, x0, None, length=n)
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
    best = (min(tl) - min(ts)) / reps * 1e6
    print(f"{tag}: {best:.2f} us/layer", flush=True)
    return best


t1 = timed(False, W_IC, "gu-rt + down-IC (z12 state, first)")
t2 = timed(True, W_RT, "gu-rt + down-RT (subgroup segments)")
t3 = timed(False, W_IC, "gu-rt + down-IC (last, drift)")
print(f"down-rt delta: {min(t1, t3) - t2:.2f} us/layer", flush=True)
print("SESSION_Z13_DONE", flush=True)
