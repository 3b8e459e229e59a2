"""TPU session O: DMA-geometry sweep — can ANY access pattern beat 702 GB/s?

Facts so far: rt kernel = pure-DMA-bound at 672; XLA dense bf16 matmul = 702;
nameplate = 819. The 90%-of-819 target needs >= 737 sustained. Sweep the
dma-only probe (zero compute, full-block touch-free*) over block geometry,
iteration order, and stream multiplicity.

*DMA is driven by the BlockSpec pipeline, not element use — the kernel body
reads 8x128 of the block only, so measured time = pure DMA + tiny fixed VPU.
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

K, N = 4096, 4096  # q/o projection, packed rows = K/8 = 512
PR = K // 8  # packed rows per copy
C = 32  # copies: 32 x 8 MB = 256 MB rotation


@functools.partial(jax.jit, static_argnames=("br", "bc", "order", "streams", "reps"))
def dma_probe(x8, qa, qb, *, br, bc, order, streams, reps):
    """Read every [br, bc] block of qa (and qb if streams=2) once per copy."""
    nr = (C * PR) // br
    nc = (N // (-streams if streams < 0 else 1)) // bc
    grid = (nr, nc) if order == "r_outer" else (nc, nr)

    if order == "r_outer":
        idx = lambda i, j: (i, j)
    else:
        idx = lambda j, i: (i, j)

    def kern(x_ref, *refs):
        o_ref = refs[-1]
        t = refs[0][:8, :128].astype(jnp.float32)
        for s in range(1, abs(streams)):
            t = t + refs[s][:8, :128].astype(jnp.float32)
        o_ref[:] = t * 1e-18 + x_ref[:]

    in_specs = [pl.BlockSpec((8, 128), lambda *a: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((br, bc), idx, memory_space=pltpu.VMEM)]
    args = [qa]
    if streams > 1:  # distinct arrays (alternate qa/qb)
        for s in range(1, streams):
            in_specs.append(pl.BlockSpec((br, bc), idx, memory_space=pltpu.VMEM))
            args.append(qb if s % 2 else qa)
    elif streams < 0:
        # |streams| slices of the SAME array: stream s covers a disjoint
        # column band [s*N/|S| ...] — no layout change needed in the model
        S = -streams
        for s in range(1, S):
            off = (s * (N // S)) // bc

            def idx_s(i, j, off=off):
                return (i, j + off) if order == "r_outer" else (j, i + off)

            # careful: arg order differs per `order`
            if order == "r_outer":
                in_specs.append(pl.BlockSpec((br, bc), lambda i, j, off=off: (i, j + off), memory_space=pltpu.VMEM))
            else:
                in_specs.append(pl.BlockSpec((br, bc), lambda j, i, off=off: (i, j + off), memory_space=pltpu.VMEM))
            args.append(qa)

    def call(xc):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, 128), lambda *a: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(xc, *args)

    def rep(i, c):
        xc = x8 + c * 1e-30
        return c + call(xc)[0, 0] * 1e-18

    return jax.lax.fori_loop(0, reps, rep, jnp.float32(0.0))


def timeit(fn, total_bytes, n=3):
    float(fn())
    best = None
    for _ in range(n):
        t0 = time.time()
        float(fn())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return total_bytes / best / 1e9


def main():
    rng = np.random.default_rng(0)
    qa = jnp.asarray(rng.integers(0, 2**31, size=(C * PR, N), dtype=np.int64).astype(np.int32))
    qb = jnp.asarray(rng.integers(0, 2**31, size=(C * PR, N), dtype=np.int64).astype(np.int32))
    x8 = jnp.zeros((8, 128), jnp.float32)
    per_copy = PR * N * 4
    reps = max(1, int(np.ceil(0.4 * 819e9 / (C * per_copy))))

    cases = []
    for br in (128, 256, 512):
        for bc in (512, 1024, 2048, 4096):
            if br * bc * 4 * 2 > 12 * 2**20:  # 2 buffers under VMEM
                continue
            cases.append((br, bc, "r_outer", 1))
    cases = [
        (256, 1024, "r_outer", 2),
        (256, 1024, "r_outer", 3),
        (256, 512, "r_outer", 4),
        (128, 1024, "r_outer", 4),
        (256, 1024, "r_outer", -2),  # same-array column bands
        (256, 1024, "r_outer", -4),
        (128, 512, "r_outer", -8),
        (256, 512, "r_outer", -4),
    ]

    for br, bc, order, streams in cases:
        total = C * per_copy * reps * (streams if streams > 0 else 1)
        try:
            gbs = timeit(
                lambda: dma_probe(x8, qa, qb, br=br, bc=bc, order=order,
                                  streams=streams, reps=reps),
                total,
            )
            log(f"  br={br:4d} bc={bc:4d} {order} s{streams}: {gbs:6.0f} GB/s")
        except Exception as e:
            log(f"  br={br:4d} bc={bc:4d} {order} s{streams}: FAIL {str(e)[:80]}")
    log(f"DONE [t+{time.time()-t_start:.0f}s]")


if __name__ == "__main__":
    main()
