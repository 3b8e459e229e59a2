"""Session Z11 (round 4): WHY is the e2e MoE kernel's per-slot cost 6.7 us
when its DMA is 3.4 and its MXU ~3.3? (Z10: slot sweep exactly linear,
unroll neutral -> DMA and compute look fully serialized.)

Variants (self-contained kernel copies; some wrong-numerics on purpose):

  REF       production structure (nbuf=3)
  NOGUARD   prefetch starts unconditional (clamped ids) — tests whether
            the pl.when scalar-conditional around DMA starts fences the
            pipeline
  DMAONLY   waits + trivial consume, no MLP compute — the loop's pure
            DMA rate
  NODMA     compute from buffer 0, no starts/waits — the loop's pure
            compute rate
  SPREAD    the 4 next-slot starts interleaved BETWEEN compute stages
  NBUF6     deeper prefetch with small buffers only possible at conc
            routing? (skipped if VMEM fails)

All at IID routing (55 slots), 600-rep in-graph scans, min-min.
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)

from gptqmodel_tpu.ops.pallas_qmoe import (
    StackedQuantExperts, fuse_gate_up, plan_rows_jit,
    _ic_contract, _act_kernel, _plane_perm_matrix,
)
from gptqmodel_tpu.ops.pallas_qmatmul import _plane_permute_x

rng = np.random.default_rng(0)
bits, g = 4, 128
E, D, F = 128, 2048, 768
tokens, topk, bm = 8, 8, 8
M = tokens * topk
N8 = 8  # x rows padded to 8 (tokens == 8)


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
pk = 3 * D * F * bits // 8 + 3 * D * F // g * 2
Gp, Gp_d = gu.scales.shape[1], down.scales.shape[1]
Kpf, Fpf, twoF = D // 8, F // 8, 2 * F

# iid routing plan
ti = np.stack([rng.choice(E, size=topk, replace=False) for _ in range(tokens)])
tw = rng.uniform(0.1, 1.0, (tokens, topk)).astype(np.float32)
flat_e = jnp.asarray(ti.reshape(-1), jnp.int32)
S = -(-M // bm) + min(E, M)
ids_j, counts_j, row_pos = plan_rows_jit(flat_e, E, bm, S)
uniq = len(np.unique(ti))
used = int(np.sum(np.asarray(counts_j) > 0))
print(f"uniq={uniq} used_slots={used} S={S} "
      f"floor={uniq*pk/700e9*1e6:.1f} us", flush=True)

tok_flat = jnp.arange(M, dtype=jnp.int32) // topk
M_pad = S * bm
tok_col = jnp.full((M_pad, 1), -1, jnp.int32).at[row_pos, 0].set(tok_flat)
w_col = jnp.zeros((M_pad, 1), jnp.float32).at[row_pos, 0].set(
    jnp.asarray(tw.reshape(-1)))
n_used = jnp.sum(counts_j > 0, dtype=jnp.int32)[None]

x0 = _plane_permute_x(
    jnp.asarray(rng.standard_normal((N8, D)) * 0.5, jnp.bfloat16), D, 8, bits)


def make(variant, nbuf=3):
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

        def dmas_clamped(slot, s):
            e = ids_ref[jax.lax.min(s, jnp.int32(S - 1))]
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

        def compute(cur, i):
            r0 = i * bm
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
            inner = jnp.dot(inner, perm_ref[:].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            y = _ic_contract(inner, d_buf[cur].astype(jnp.uint32),
                             sd_buf[cur], bits=bits, G=down.G,
                             zero_const=8.0)
            wr = w_ref[pl.ds(r0, bm), :]
            o_ref[:] += jax.lax.dot_general(
                sel.astype(jnp.float32), y * wr,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(n > 0)
        def _():
            if variant != "nodma":
                for j in range(nbuf - 1):
                    if variant == "noguard":
                        for dd in dmas_clamped(j, j):
                            dd.start()
                    else:
                        @pl.when(j < n)
                        def _(j=j):
                            for dd in dmas(j, j):
                                dd.start()

            def body(i, carry):
                cur = jax.lax.rem(i, nbuf)
                nxt = jax.lax.rem(i + nbuf - 1, nbuf)
                if variant == "noguard":
                    for dd in dmas_clamped(nxt, jax.lax.min(
                            i + nbuf - 1, jnp.int32(S - 1))):
                        dd.start()
                elif variant != "nodma":
                    @pl.when(i + nbuf - 1 < n)
                    def _():
                        for dd in dmas(nxt, i + nbuf - 1):
                            dd.start()

                if variant != "nodma":
                    for dd in dmas(cur, i):
                        dd.wait()

                if variant == "dmaonly":
                    # consume one row of each buffer so DMAs can't be elided
                    o_ref[0, :twoF] += gu_buf[cur, 0, :].astype(jnp.float32)
                    o_ref[0, :] += d_buf[cur, 0, :].astype(jnp.float32)
                elif variant == "nodma":
                    compute(0, i)
                else:
                    compute(cur, i)
                return carry

            jax.lax.fori_loop(0, n, body, 0)

            if variant == "noguard":
                # drain the clamped over-started DMAs (slots n..n+nbuf-2):
                # an outstanding semaphore at kernel end aborts the device
                def drain(k, c):
                    for dd in dmas_clamped(jax.lax.rem(k, nbuf),
                                           jax.lax.min(k, jnp.int32(S - 1))):
                        dd.wait()
                    return c
                jax.lax.fori_loop(n, n + nbuf - 1, drain, 0)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def run(xp, w):
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
        )(ids_j, n_used, xp, tok_col, w_col, w[0], w[1], w[2], w[3],
          jnp.asarray(_plane_perm_matrix(F, bits), jnp.bfloat16))

    return run


WARGS = (gu.qweight, gu.scales, down.qweight, down.scales)


def timed(fn, tag, reps=600, short=60):
    def loop_n(n, x0, w):
        def body(c, _):
            y = fn(c, w)
            return (c * jnp.bfloat16(0.999)
                    + y[:N8, :].astype(jnp.bfloat16) * 1e-6), ()
        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c

    sfn = jax.jit(functools.partial(loop_n, short))
    lfn = jax.jit(functools.partial(loop_n, short + reps))
    try:
        sfn(x0, WARGS).block_until_ready()
        lfn(x0, WARGS).block_until_ready()
    except Exception as e:
        print(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:160]})",
              flush=True)
        return None
    ts, tl = [], []
    for _ in range(5):
        t0 = time.perf_counter(); sfn(x0, WARGS).block_until_ready()
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); lfn(x0, WARGS).block_until_ready()
        tl.append(time.perf_counter() - t0)
    best = (min(tl) - min(ts)) / reps * 1e6
    print(f"{tag}: {best:.2f} us/layer", flush=True)
    return best


r1 = timed(make("ref"), "REF nbuf3 (first)")
timed(make("dmaonly"), "DMAONLY (wrong numerics)")
timed(make("nodma"), "NODMA compute-only (wrong numerics)")
timed(make("ref", nbuf=5), "REF nbuf5")
timed(make("ref"), "REF nbuf3 (mid, drift)")
timed(make("noguard"), "NOGUARD unconditional clamped starts (risky, last)")
print("SESSION_Z11_DONE", flush=True)
