"""TPU session P2: factor out WHY the multi-stream kernel loses the 744.

q/o shape (K=4096, N=4096, bk=2048). Variants x S∈{1,4}:
  unpack  — qw streams + magic unpack, no x/scales/dots, out 8x128
  dots    — + per-group MXU dots + corrections, x/scales as RESIDENT
            full-size blocks (index (0,0)/(0,n): no per-k refetch pipelines)
  dotsB   — same but x/scales as per-step blocks (the production layout)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, flush=True)


t_start = time.time()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log("devices:", jax.devices(), f"[t+{time.time()-t_start:.0f}s]")

from gptqmodel_tpu.ops.pallas_qmatmul import _MAGIC_BF16

BITS, G, PF, BM = 4, 128, 8, 8
K, N = 4096, 4096
BK = 2048
ZC = 8.0
FM, MG = _MAGIC_BF16[BITS]


@functools.partial(jax.jit, static_argnames=("S", "mode", "bn", "reps"))
def probe(x, qws, scs, *, S, mode, bn, reps):
    Ns = N // S
    C = qws[0].shape[0] // (K // PF)
    gpk = BK // G
    nk = K // BK
    grid = (C, Ns // bn, nk)
    R = BK // PF
    g = G
    gpp = (2 * R) // g

    def kern(*refs):
        x_ref = refs[0]
        qw = refs[1 : 1 + S]
        sc = refs[1 + S : 1 + 2 * S]
        outs = refs[1 + 2 * S : 1 + 3 * S]
        accs = refs[1 + 3 * S :]
        k = pl.program_id(2)
        n = pl.program_id(1)
        nk_ = pl.num_programs(2)

        for s in range(S):
            u = qw[s][:].astype(jnp.uint32)
            if mode == "unpack":
                t8 = jnp.zeros((8, 128), jnp.float32)
                for a in range(PF // 2):
                    t = ((u >> jnp.uint32(BITS * a)) & jnp.uint32(FM)) | jnp.uint32(MG)
                    wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16)
                    t8 = t8 + wa[:8, :128].astype(jnp.float32)
                outs[s][:] = t8 * 1e-18
            else:
                @pl.when(k == 0)
                def _(acc_ref=accs[s]):
                    acc_ref[:] = jnp.zeros_like(acc_ref)

                if mode == "dots":  # resident x/scales
                    x = x_ref[pl.ds(0, BM), pl.ds(k * BK, BK)].astype(jnp.bfloat16)
                    sfull = sc[s][:]  # [G_all, Ns] -> slice per n,k
                    sf = sfull[
                        pl.ds(k * gpk, gpk), pl.ds(n * bn, bn)
                    ].astype(jnp.float32)
                else:  # dotsB: per-step blocks
                    x = x_ref[:].astype(jnp.bfloat16)
                    sf = sc[s][:].astype(jnp.float32)
                zs = jnp.float32(ZC + 128.0) * sf
                acc = accs[s][:]
                for a in range(PF // 2):
                    t = ((u >> jnp.uint32(BITS * a)) & jnp.uint32(FM)) | jnp.uint32(MG)
                    wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16)
                    for gi in range(gpp):
                        g_abs = a * gpp + gi
                        xg = x[:, g_abs * g : (g_abs + 1) * g]
                        P = jnp.dot(xg, wa[gi * g : (gi + 1) * g],
                                    preferred_element_type=jnp.float32)
                        X1g = jnp.sum(xg.astype(jnp.float32), axis=1)
                        acc += P * sf[g_abs][None, :] - X1g[:, None] * zs[g_abs][None, :]
                accs[s][:] = acc

                @pl.when(k == nk_ - 1)
                def _(o_ref=outs[s], acc_ref=accs[s]):
                    o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    qw_specs = [
        pl.BlockSpec((BK // PF, bn), lambda c, n, k: (c * nk + k, n),
                     memory_space=pltpu.VMEM)
        for _ in range(S)
    ]
    if mode == "unpack":
        x_spec = pl.BlockSpec((8, 128), lambda c, n, k: (0, 0), memory_space=pltpu.VMEM)
        s_specs = [pl.BlockSpec((8, 128), lambda c, n, k: (0, 0), memory_space=pltpu.VMEM)] * S
        out_specs = [pl.BlockSpec((8, 128), lambda c, n, k: (0, 0), memory_space=pltpu.VMEM)] * S
        out_shape = [jax.ShapeDtypeStruct((8, 128), jnp.float32)] * S
        scratch = []
    elif mode == "dots":
        x_spec = pl.BlockSpec((BM, K), lambda c, n, k: (0, 0), memory_space=pltpu.VMEM)
        s_specs = [pl.BlockSpec((K // G, Ns), lambda c, n, k: (0, 0), memory_space=pltpu.VMEM)] * S
        out_specs = [pl.BlockSpec((BM, bn), lambda c, n, k: (0, n), memory_space=pltpu.VMEM)] * S
        out_shape = [jax.ShapeDtypeStruct((BM, Ns), jnp.bfloat16)] * S
        scratch = [pltpu.VMEM((BM, bn), jnp.float32) for _ in range(S)]
    else:  # dotsB
        x_spec = pl.BlockSpec((BM, BK), lambda c, n, k: (0, k), memory_space=pltpu.VMEM)
        s_specs = [pl.BlockSpec((gpk, bn), lambda c, n, k: (k, n), memory_space=pltpu.VMEM)] * S
        out_specs = [pl.BlockSpec((BM, bn), lambda c, n, k: (0, n), memory_space=pltpu.VMEM)] * S
        out_shape = [jax.ShapeDtypeStruct((BM, Ns), jnp.bfloat16)] * S
        scratch = [pltpu.VMEM((BM, bn), jnp.float32) for _ in range(S)]

    def call(xc):
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[x_spec] + qw_specs + s_specs,
            out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "parallel", "arbitrary"),
            ),
        )(xc, *qws, *scs)

    def rep(i, c):
        xc = x + (c * jnp.bfloat16(1e-30)).astype(x.dtype)
        outs = call(xc)
        return c + outs[0][0, 0].astype(jnp.float32) * 1e-18

    return jax.lax.fori_loop(0, reps, rep, jnp.float32(0.0))


def main():
    rng = np.random.default_rng(0)
    per = K * N * BITS // 8
    C = 32
    reps = max(1, int(np.ceil(0.3 * 819e9 / (C * per))))
    x = jnp.asarray(rng.standard_normal((BM, K)).astype(np.float32), jnp.bfloat16)
    for S in (1, 2, 4):
        Ns = N // S
        qws = tuple(
            jnp.asarray(rng.integers(0, 2**31, size=(C * K // PF, Ns), dtype=np.int64).astype(np.int32))
            for _ in range(S)
        )
        scs = tuple(jnp.full((K // G, Ns), 0.01, jnp.bfloat16) for _ in range(S))
        for mode in ("unpack", "dots", "dotsB"):
            bn = min(1024, Ns)
            try:
                fn = lambda: probe(x, qws, scs, S=S, mode=mode, bn=bn, reps=reps)
                float(fn())
                best = None
                for _ in range(3):
                    t0 = time.time()
                    float(fn())
                    dt = (time.time() - t0) / (C * reps)
                    best = dt if best is None else min(best, dt)
                log(f"  S={S} {mode:6s} bn={bn}: {best*1e6:6.1f} us  {per/best/1e9:5.0f} GB/s")
            except Exception as e:
                log(f"  S={S} {mode:6s}: FAIL {str(e)[:100]}")
    log(f"DONE [t+{time.time()-t_start:.0f}s]")


if __name__ == "__main__":
    main()
