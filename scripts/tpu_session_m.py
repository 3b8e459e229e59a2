"""TPU session M: WHICH resource binds the rt sym kernel at llama shapes?

Variants per shape, identical grid/blocks, rotating weight copies (>=256 MB
per shape so XLA can't pin anything in VMEM across the scan):
  dma    — read the packed block, 1 trivial VPU op, no unpack/dot
           (achievable stream BW for this block geometry)
  unpack — all magic unpack parts, no MXU dots, no scale work
  dots   — unpack + per-group MXU dots, no scale/zero corrections
  full   — the production _qmm_rt_sym_kernel path via qmatmul

If dma ~ full: BW-bound, tune DMA geometry. If unpack << dma: VPU-bound.
If dots-unpack large: MXU/slicing bound. In-graph scan timing, min-of-3.
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

from gptqmodel_tpu.ops.pallas_qmatmul import (
    _MAGIC_BF16, qmatmul, rt_block_k_for,
)

BITS, G = 4, 128
PF = 32 // BITS
BM = 8

SHAPES = [  # (K, N, label)
    (4096, 4096, "q/o"),
    (4096, 1024, "kv"),
    (4096, 14336, "gate/up"),
    (14336, 4096, "down"),
    (4096, 128256, "lm_head"),
]


def _mk_kernel(mode, bits, kt, nt, gpk, zero_const):
    def kernel(x_ref, qw_ref, s_ref, o_ref, acc_ref):
        k = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        pf = 32 // bits
        R = kt // pf
        g = kt // gpk
        u = qw_ref[:].astype(jnp.uint32)
        x = x_ref[:].astype(jnp.bfloat16)
        sf = s_ref[:].astype(jnp.float32)
        acc = acc_ref[:]

        if mode == "dma":
            # touch EVERY loaded word (sum over sublanes — prevents Mosaic
            # from DCE'ing rows; costs ~R/1024 cycles/elem, noted in analysis)
            touch = jnp.sum(
                qw_ref[:].astype(jnp.float32), axis=0, keepdims=True
            )  # [1, nt]
            acc += jnp.broadcast_to(touch[:, : acc.shape[1]], acc.shape) * 1e-18
        else:
            gpp = (2 * R) // g
            fmask, magic = _MAGIC_BF16[bits]
            zs = jnp.float32(zero_const + 128.0) * sf
            for a in range(pf // 2):
                t = ((u >> jnp.uint32(bits * a)) & jnp.uint32(fmask)) | jnp.uint32(magic)
                wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16)
                if mode == "unpack":
                    touch = jnp.sum(
                        wa.astype(jnp.float32), axis=0, keepdims=True
                    )
                    acc += jnp.broadcast_to(
                        touch[:, : acc.shape[1]], acc.shape
                    ) * 1e-18
                elif mode == "dots":
                    for gi in range(gpp):
                        g_abs = a * gpp + gi
                        xg = x[:, g_abs * g : (g_abs + 1) * g]
                        acc += jnp.dot(
                            xg, wa[gi * g : (gi + 1) * g],
                            preferred_element_type=jnp.float32,
                        )
                else:  # fullx = full but inline (sanity vs qmatmul)
                    for gi in range(gpp):
                        g_abs = a * gpp + gi
                        xg = x[:, g_abs * g : (g_abs + 1) * g]
                        P = jnp.dot(
                            xg, wa[gi * g : (gi + 1) * g],
                            preferred_element_type=jnp.float32,
                        )
                        X1g = jnp.sum(xg.astype(jnp.float32), axis=1)
                        acc += P * sf[g_abs][None, :] - X1g[:, None] * zs[g_abs][None, :]
        acc_ref[:] = acc

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "K", "N", "bk", "bn", "reps"))
def probe(x, qws_flat, scales, *, mode, K, N, bk, bn, reps=1):
    """Stream C distinct weight copies per call WITHOUT host-visible slicing:
    the copies axis is the outermost (arbitrary) grid dimension of ONE
    pallas_call over the flat [C*K/pf, N] array — zero-copy HBM streaming,
    exactly like the 32 distinct layers of a real model. reps repeats the
    call in-graph so the tunnel's ~35 ms dispatch latency vanishes."""
    C = qws_flat.shape[0] // (K // PF)
    gpk = bk // G
    nk = K // bk
    grid = (C, -(-N // bn), 1, nk)

    def kern(x_ref, qw_ref, s_ref, o_ref, acc_ref):
        k = pl.program_id(3)
        nk_ = pl.num_programs(3)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        R = bk // PF
        g = bk // gpk
        u = qw_ref[:].astype(jnp.uint32)
        xv = x_ref[:].astype(jnp.bfloat16)
        sf = s_ref[:].astype(jnp.float32)
        acc = acc_ref[:]
        if mode == "dma":
            touch = jnp.sum(qw_ref[:].astype(jnp.float32), axis=0, keepdims=True)
            acc += jnp.broadcast_to(touch[:, : acc.shape[1]], acc.shape) * 1e-18
        else:
            gpp = (2 * R) // g
            fmask, magic = _MAGIC_BF16[BITS]
            zs = jnp.float32(8.0 + 128.0) * sf
            for a in range(PF // 2):
                t = ((u >> jnp.uint32(BITS * a)) & jnp.uint32(fmask)) | jnp.uint32(magic)
                wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16)
                if mode == "unpack":
                    acc += jnp.broadcast_to(
                        wa[:8, : acc.shape[1]].astype(jnp.float32), acc.shape
                    ) * 1e-18
                elif mode == "dots":
                    for gi in range(gpp):
                        g_abs = a * gpp + gi
                        xg = xv[:, g_abs * g : (g_abs + 1) * g]
                        acc += jnp.dot(xg, wa[gi * g : (gi + 1) * g],
                                       preferred_element_type=jnp.float32)
                else:  # fullx
                    for gi in range(gpp):
                        g_abs = a * gpp + gi
                        xg = xv[:, g_abs * g : (g_abs + 1) * g]
                        P = jnp.dot(xg, wa[gi * g : (gi + 1) * g],
                                    preferred_element_type=jnp.float32)
                        X1g = jnp.sum(xg.astype(jnp.float32), axis=1)
                        acc += P * sf[g_abs][None, :] - X1g[:, None] * zs[g_abs][None, :]
        acc_ref[:] = acc

        @pl.when(k == nk_ - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    x_spec = pl.BlockSpec((BM, bk), lambda c, n, m, k: (m, k), memory_space=pltpu.VMEM)
    qw_spec = pl.BlockSpec(
        (bk // PF, bn), lambda c, n, m, k: (c * (K // bk) + k, n),
        memory_space=pltpu.VMEM,
    )
    s_spec = pl.BlockSpec((gpk, bn), lambda c, n, m, k: (k, n), memory_space=pltpu.VMEM)

    def call(xc):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[x_spec, qw_spec, s_spec],
            out_specs=pl.BlockSpec(
                (BM, bn), lambda c, n, m, k: (m, n), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((BM, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((BM, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "parallel", "parallel", "arbitrary"),
            ),
        )(xc, qws_flat, scales)

    def rep(i, c):
        # carry feeds the input so XLA cannot hoist the loop-invariant call
        xc = x + (c * jnp.bfloat16(1e-30)).astype(x.dtype)
        return c + call(xc)[0, 0].astype(jnp.float32) * jnp.float32(1e-18)

    return jax.lax.fori_loop(0, reps, rep, jnp.float32(0.0))


def main():
    rng = np.random.default_rng(0)
    for K, N, label in SHAPES:
        bk = rt_block_k_for(K, G, N=N)
        bn = min(2048, N)
        packed_mb = K * N * BITS / 8 / 1e6
        C = max(2, int(np.ceil(256 / packed_mb)))  # >=256MB rotation
        qws_flat = jnp.asarray(
            rng.integers(0, 2**31, size=(C * (K // PF), N), dtype=np.int64).astype(np.int32)
        )
        scales = jnp.full((K // G, N), 0.01, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((BM, K)).astype(np.float32), jnp.bfloat16)
        # enough reps that ideal device time >= 300 ms per call
        reps = max(1, int(np.ceil(0.3 * 819e3 / (C * packed_mb))))
        log(f"--- {label} K={K} N={N} bk={bk} bn={bn} copies={C} reps={reps} "
            f"({packed_mb:.0f} MB each) [t+{time.time()-t_start:.0f}s]")
        for mode in ("dma", "unpack", "dots", "fullx"):
            fn = lambda: probe(x, qws_flat, scales, mode=mode, K=K, N=N, bk=bk,
                               bn=bn, reps=reps)
            float(fn())  # compile+warm
            best = None
            for _ in range(3):
                t0 = time.time()
                float(fn())
                dt = (time.time() - t0) / (C * reps)
                best = dt if best is None else min(best, dt)
            gbs = packed_mb / 1e3 / best
            log(f"  {mode:7s}: {best*1e6:8.1f} us/matmul  {gbs:6.0f} GB/s packed")
    log(f"DONE [t+{time.time()-t_start:.0f}s]")


if __name__ == "__main__":
    main()
