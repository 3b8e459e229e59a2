"""TPU session P: multi-stream rt sym kernel — production compute at 744?

Session O: 4 concurrent DMA streams from DISTINCT HBM buffers sustain
744 GB/s (vs 705 single-stream, 819 nameplate). Here: the REAL
per-group-partial-dot sym kernel with the qweight split into S distinct
column-band buffers, S in_specs, one fused kernel — verify correctness vs
qmatmul and measure the streamed rate at llama shapes.
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

from gptqmodel_tpu.ops.pallas_qmatmul import _MAGIC_BF16, qmatmul
from gptqmodel_tpu.ops.pack import repack_rt

BITS, G, PF, BM = 4, 128, 8, 8
ZC = 8.0


def ms_kernel(S, bits, kt, bn, gpk, zero_const):
    """S-stream variant of _qmm_rt_sym_kernel: stream s handles its own
    [kt/pf, bn] block + [gpk, bn] scales + [bm, bn] out/acc."""

    def kern(*refs):
        x_ref = refs[0]
        qw = refs[1 : 1 + S]
        sc = refs[1 + S : 1 + 2 * S]
        outs = refs[1 + 2 * S : 1 + 3 * S]
        accs = refs[1 + 3 * S :]
        k = pl.program_id(2)
        nk = pl.num_programs(2)

        pf = 32 // bits
        R = kt // pf
        g = kt // gpk
        gpp = (2 * R) // g
        fmask, magic = _MAGIC_BF16[bits]
        x = x_ref[:].astype(jnp.bfloat16)

        for s in range(S):
            @pl.when(k == 0)
            def _(acc_ref=accs[s]):
                acc_ref[:] = jnp.zeros_like(acc_ref)

        for s in range(S):
            u = qw[s][:].astype(jnp.uint32)
            sf = sc[s][:].astype(jnp.float32)
            zs = jnp.float32(zero_const + 128.0) * sf
            acc = accs[s][:]
            for a in range(pf // 2):
                t = ((u >> jnp.uint32(bits * a)) & jnp.uint32(fmask)) | jnp.uint32(magic)
                wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16)
                for gi in range(gpp):
                    g_abs = a * gpp + gi
                    xg = x[:, g_abs * g : (g_abs + 1) * g]
                    P = jnp.dot(xg, wa[gi * g : (gi + 1) * g],
                                preferred_element_type=jnp.float32)
                    X1g = jnp.sum(xg.astype(jnp.float32), axis=1)
                    acc += P * sf[g_abs][None, :] - X1g[:, None] * zs[g_abs][None, :]
            accs[s][:] = acc

            @pl.when(k == nk - 1)
            def _(o_ref=outs[s], acc_ref=accs[s]):
                o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kern


@functools.partial(jax.jit, static_argnames=("S", "K", "N", "bk", "bn", "reps"))
def qmm_ms(x, qws, scs, *, S, K, N, bk, bn, reps=1):
    """qws: tuple of S stacked band arrays [C*K/pf, N/S]; scs likewise."""
    Ns = N // S
    C = qws[0].shape[0] // (K // PF)
    gpk = bk // G
    grid = (C, -(-Ns // bn), K // bk)  # (copy, n, k)

    kern_body = ms_kernel(S, BITS, bk, bn, gpk, ZC)

    # shift program ids: kernel expects (n, m, k)-ish; we give (c, n, k) and
    # read k at dim 2 — matches pl.program_id(2) use in ms_kernel
    x_spec = pl.BlockSpec((BM, bk), lambda c, n, k: (0, k), memory_space=pltpu.VMEM)
    qw_specs = [
        pl.BlockSpec((bk // PF, bn), lambda c, n, k: (c * (K // bk) + k, n),
                     memory_space=pltpu.VMEM)
        for _ in range(S)
    ]
    s_specs = [
        pl.BlockSpec((gpk, bn), lambda c, n, k: (k, n), memory_space=pltpu.VMEM)
        for _ in range(S)
    ]
    out_specs = [
        pl.BlockSpec((BM, bn), lambda c, n, k: (0, n), memory_space=pltpu.VMEM)
        for _ in range(S)
    ]

    def call(xc):
        return pl.pallas_call(
            kern_body,
            grid=grid,
            in_specs=[x_spec] + qw_specs + s_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((BM, Ns), jnp.bfloat16)] * S,
            scratch_shapes=[pltpu.VMEM((BM, bn), jnp.float32) for _ in range(S)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "parallel", "arbitrary"),
            ),
        )(xc, *qws, *scs)

    def rep(i, c):
        xc = x + (c * jnp.bfloat16(1e-30)).astype(x.dtype)
        outs = call(xc)
        return c + outs[0][0, 0].astype(jnp.float32) * 1e-18

    return jax.lax.fori_loop(0, reps, rep, jnp.float32(0.0))


def correctness(S, K=4096, N=4096, bk=2048, bn=512):
    rng = np.random.default_rng(0)
    Ns = N // S
    qw_int = rng.integers(0, 2**31, size=(K // PF, N), dtype=np.int64).astype(np.int32)
    scales = (rng.integers(8, 32, size=(K // G, N)) * 2.0**-10).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((BM, K)).astype(np.float32), jnp.bfloat16)

    ref = qmatmul(
        x, jnp.asarray(repack_rt(qw_int, BITS, bk)), jnp.asarray(scales),
        jnp.asarray(scales), bits=BITS, group_size=G, rt=True, rt_block_k=bk,
        zero_const=ZC,
    )

    qws, scs = [], []
    for s in range(S):
        band = qw_int[:, s * Ns : (s + 1) * Ns]
        qws.append(jnp.asarray(repack_rt(band, BITS, bk)))
        scs.append(jnp.asarray(scales[:, s * Ns : (s + 1) * Ns], jnp.bfloat16))

    # single call (C=1, reps=1): reconstruct outs for comparison
    Ns_ = Ns
    outs = _call_once(x, tuple(qws), tuple(scs), S=S, K=K, N=N, bk=bk, bn=bn)
    got = jnp.concatenate(outs, axis=1)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    log(f"S={S} correctness: max abs diff {err:.3e} (rel {rel:.2e})")
    assert rel < 2e-2, rel
    return True


@functools.partial(jax.jit, static_argnames=("S", "K", "N", "bk", "bn"))
def _call_once(x, qws, scs, *, S, K, N, bk, bn):
    Ns = N // S
    gpk = bk // G
    grid = (1, -(-Ns // bn), K // bk)
    kern_body = ms_kernel(S, BITS, bk, bn, gpk, ZC)
    x_spec = pl.BlockSpec((BM, bk), lambda c, n, k: (0, k), memory_space=pltpu.VMEM)
    qw_specs = [pl.BlockSpec((bk // PF, bn), lambda c, n, k: (k, n), memory_space=pltpu.VMEM) for _ in range(S)]
    s_specs = [pl.BlockSpec((gpk, bn), lambda c, n, k: (k, n), memory_space=pltpu.VMEM) for _ in range(S)]
    out_specs = [pl.BlockSpec((BM, bn), lambda c, n, k: (0, n), memory_space=pltpu.VMEM) for _ in range(S)]
    return pl.pallas_call(
        kern_body, grid=grid,
        in_specs=[x_spec] + qw_specs + s_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((BM, Ns), jnp.bfloat16)] * S,
        scratch_shapes=[pltpu.VMEM((BM, bn), jnp.float32) for _ in range(S)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
    )(x, *qws, *scs)


def bench(S, K, N, bk, bn, label):
    rng = np.random.default_rng(1)
    Ns = N // S
    per = K * N * BITS // 8
    C = max(2, int(np.ceil(256e6 / per)))
    reps = max(1, int(np.ceil(0.3 * 819e9 / (C * per))))
    qws = tuple(
        jnp.asarray(rng.integers(0, 2**31, size=(C * K // PF, Ns), dtype=np.int64).astype(np.int32))
        for _ in range(S)
    )
    scs = tuple(jnp.full((K // G, Ns), 0.01, jnp.bfloat16) for _ in range(S))
    x = jnp.asarray(rng.standard_normal((BM, K)).astype(np.float32), jnp.bfloat16)
    fn = lambda: qmm_ms(x, qws, scs, S=S, K=K, N=N, bk=bk, bn=bn, reps=reps)
    float(fn())
    best = None
    for _ in range(3):
        t0 = time.time()
        float(fn())
        dt = (time.time() - t0) / (C * reps)
        best = dt if best is None else min(best, dt)
    gbs = per / best / 1e9
    log(f"  {label} S={S} bk={bk} bn={bn}: {best*1e6:7.1f} us  {gbs:5.0f} GB/s packed")


def main():
    for S in (2, 4):
        correctness(S)
    for S, bn in ((1, 2048), (2, 1024), (4, 512), (4, 1024)):
        bench(S, 4096, 4096, 2048, min(bn, 4096 // S), "q/o")
    bench(1, 4096, 14336, 2048, 2048, "gate/up")
    bench(4, 4096, 14336, 2048, 512, "gate/up")  # Ns=3584=7x512
    bench(1, 14336, 4096, 2048, 2048, "down")
    bench(4, 14336, 4096, 2048, 1024, "down")
    log(f"DONE [t+{time.time()-t_start:.0f}s]")


if __name__ == "__main__":
    main()
