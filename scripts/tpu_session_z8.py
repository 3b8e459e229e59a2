"""Session Z8 (round 3): per-slot overhead anatomy of the e2e kernel.

Z7 established the cost model: floor(uniq experts) + ~4.3 us per USED
slot + ~20 us routing glue. 14 used slots x 4.3 = 60 us/layer of slot
overhead — where inside the kernel? Fixed 13-expert plan, kernel-only
scans (min-min):

  D3   nbuf=3 (ref)
  D4   nbuf=4 (deeper prefetch)
  DNP  perm matmul skipped (WRONG numerics — timing isolation of the
       [bm, F] @ [F, F] in-register reorder)
  DNW  one-hot gather + combine skipped (feed x rows directly, no w) —
       isolates the sel dots
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)

from gptqmodel_tpu.ops import pallas_qmoe as Q
from gptqmodel_tpu.ops.pallas_qmoe import (
    StackedQuantExperts, build_slots, fuse_gate_up, qmoe_mlp_forward_e2e,
    _ic_contract, _act_kernel, _plane_perm_matrix,
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

routed = rng.choice(E, size=13, replace=False)
top_i0 = rng.choice(routed, size=(tokens, topk))
top_w0 = rng.uniform(0.1, 1.0, (tokens, topk)).astype(np.float32)
pos0, ids0, counts0, order0 = build_slots(top_i0, E, bm, S)
tok0 = jnp.asarray(order0 // topk)
pos0j, ids0j, counts0j = map(jnp.asarray, (pos0, ids0, counts0))
w0 = jnp.asarray(top_w0.reshape(-1)[order0])
print("used slots:", int((counts0 > 0).sum()), flush=True)


def make_kernel(skip_perm=False, skip_sel=False, nbuf=3):
    Gp, Gp_d = gu.scales.shape[1], down.scales.shape[1]
    Kpf = D // 8
    Fpf = F // 8
    twoF = 2 * F
    N8 = 8

    def kern(ids_ref, nused_ref, x_ref, tok_ref, w_ref,
             qwgu_hbm, sgu_hbm, qwd_hbm, sd_hbm, perm_ref, o_ref,
             gu_buf, sgu_buf, d_buf, sd_buf, sems):
        n = nused_ref[0]
        o_ref[:] = jnp.zeros_like(o_ref)

        def dmas(slot, s):
            e = ids_ref[s]
            return (
                pltpu.make_async_copy(qwgu_hbm.at[e], gu_buf.at[slot],
                                      sems.at[slot, 0]),
                pltpu.make_async_copy(sgu_hbm.at[e], sgu_buf.at[slot],
                                      sems.at[slot, 1]),
                pltpu.make_async_copy(qwd_hbm.at[e], d_buf.at[slot],
                                      sems.at[slot, 2]),
                pltpu.make_async_copy(sd_hbm.at[e], sd_buf.at[slot],
                                      sems.at[slot, 3]),
            )

        @pl.when(n > 0)
        def _():
            for j in range(nbuf - 1):
                @pl.when(j < n)
                def _(j=j):
                    for dd in dmas(j, j):
                        dd.start()

            def body(i, carry):
                cur = jax.lax.rem(i, nbuf)

                @pl.when(i + nbuf - 1 < n)
                def _():
                    for dd in dmas(jax.lax.rem(i + nbuf - 1, nbuf),
                                   i + nbuf - 1):
                        dd.start()

                for dd in dmas(cur, i):
                    dd.wait()

                r0 = i * bm
                if skip_sel:
                    x = x_ref[:].astype(jnp.bfloat16)
                else:
                    tokr = tok_ref[pl.ds(r0, bm), :]
                    cols = jax.lax.broadcasted_iota(jnp.int32, (bm, N8), 1)
                    sel = (cols == tokr).astype(jnp.bfloat16)
                    x = jnp.dot(sel, x_ref[:],
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
                both = _ic_contract(x, gu_buf[cur].astype(jnp.uint32),
                                    sgu_buf[cur], bits=bits, G=gu.G,
                                    zero_const=8.0)
                gg, uu = both[:, :F], both[:, F:]
                inner = (_act_kernel("silu")(gg) * uu).astype(jnp.bfloat16)
                if not skip_perm:
                    inner = jnp.dot(inner, perm_ref[:].astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32
                                    ).astype(jnp.bfloat16)
                y = _ic_contract(inner, d_buf[cur].astype(jnp.uint32),
                                 sd_buf[cur], bits=bits, G=down.G,
                                 zero_const=8.0)
                if skip_sel:
                    o_ref[:] += y
                else:
                    wr = w_ref[pl.ds(r0, bm), :]
                    o_ref[:] += jax.lax.dot_general(
                        sel.astype(jnp.float32), y * wr,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return carry

            jax.lax.fori_loop(0, n, body, 0)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def run(xp, tok_col, w_col, gu_q, gu_s, d_q, d_s):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(),
                in_specs=[vmem, vmem, vmem,
                          any_spec, any_spec, any_spec, any_spec, vmem],
                out_specs=vmem,
                scratch_shapes=[
                    pltpu.VMEM((nbuf, Kpf, twoF), jnp.int32),
                    pltpu.VMEM((nbuf, Gp, twoF), jnp.bfloat16),
                    pltpu.VMEM((nbuf, Fpf, D), jnp.int32),
                    pltpu.VMEM((nbuf, Gp_d, D), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((nbuf, 4)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((N8, D), jnp.float32),
        )(ids0j, jnp.sum(counts0j > 0, dtype=jnp.int32)[None],
          xp, tok_col, w_col, gu_q, gu_s, d_q, d_s,
          jnp.asarray(_plane_perm_matrix(F, bits), jnp.bfloat16))

    return run


tok_col = jnp.full((M_pad, 1), -1, jnp.int32).at[pos0j, 0].set(
    tok0.astype(jnp.int32))
w_col = jnp.zeros((M_pad, 1), jnp.float32).at[pos0j, 0].set(w0)


def timed(fn, x0, tag, reps=2000, short=200):
    wargs = (tok_col, w_col, gu.qweight, gu.scales, down.qweight,
             down.scales)

    def loop_n(n, x0, w):
        def body(c, _):
            y = fn(c, *w)
            return (c * jnp.bfloat16(0.999)
                    + y[:8, :].astype(jnp.bfloat16) * 1e-6), ()
        c, _ = jax.lax.scan(body, x0.astype(jnp.bfloat16), None, length=n)
        return c

    sfn = jax.jit(functools.partial(loop_n, short))
    lfn = jax.jit(functools.partial(loop_n, short + reps))
    sfn(x0, wargs).block_until_ready()
    lfn(x0, wargs).block_until_ready()
    ts, tl = [], []
    for _ in range(5):
        t0 = time.perf_counter(); sfn(x0, wargs).block_until_ready()
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); lfn(x0, wargs).block_until_ready()
        tl.append(time.perf_counter() - t0)
    best = (min(tl) - min(ts)) / reps
    print(f"{tag}: {best*1e6:.2f} us/call", flush=True)
    return best


xp0 = _plane_permute_x(
    jnp.asarray(rng.standard_normal((8, D)) * 0.5, jnp.bfloat16), D, 8, bits)
pk = 3 * D * F * bits // 8 + 3 * D * F // g * 2
print(f"floor at 13 experts: {13*pk/700e9*1e6:.1f} us", flush=True)
timed(make_kernel(), xp0, "D3  nbuf=3 (ref)")
timed(make_kernel(nbuf=4), xp0, "D4  nbuf=4")
timed(make_kernel(skip_perm=True), xp0, "DNP perm matmul skipped")
timed(make_kernel(skip_sel=True), xp0, "DNW sel gather+combine skipped")
print("SESSION_Z8_DONE", flush=True)
