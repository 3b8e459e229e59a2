"""TPU session Q: cheaper unpack — does u16-domain magic beat 12 ops/word?

P2: full u32 magic unpack sustains 699 GB/s (VPU-capped ~= single-stream
DMA); multi-buffer DMA alone reaches 744. If unpack gets cheaper per byte,
multi-stream + cheap-unpack can pass 737 (90% of nameplate).

Variants (unpack-only, qw S streams, minimal other pipelines):
  u32     — current: 4 parts x (shift,and,or) on [R,bn] u32      (12/word)
  u32lite — a=0 shift-free: 11/word
  u16     — bitcast to [2R,bn] u16; a=0: and,or; a=1,2: shift,and,or;
            a=3: shift,or  => 10 u16-ops/4-codes; packed-2x would halve
  u16 + S=4 multi-stream — the candidate production config
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

BITS, G, PF, BM = 4, 128, 8, 8
K, N = 4096, 4096
BK = 2048
FM, MG = 0x000F000F, 0x43004300


@functools.partial(jax.jit, static_argnames=("S", "mode", "bn", "reps"))
def probe(x8, qws, *, S, mode, bn, reps):
    Ns = N // S
    C = qws[0].shape[0] // (K // PF)
    nk = K // BK
    grid = (C, Ns // bn, nk)
    R = BK // PF

    def kern(*refs):
        qw = refs[1 : 1 + S]
        outs = refs[1 + S :]
        for s in range(S):
            u = qw[s][:].astype(jnp.uint32)
            t8 = jnp.zeros((8, 128), jnp.float32)
            if mode.startswith("u32"):
                nparts = 2 if mode == "u32half" else PF // 2
                for a in range(nparts):
                    if mode in ("u32lite", "u32half") and a == 0:
                        t = (u & jnp.uint32(FM)) | jnp.uint32(MG)
                    else:
                        t = ((u >> jnp.uint32(BITS * a)) & jnp.uint32(FM)) | jnp.uint32(MG)
                    wa = pltpu.bitcast(t.astype(jnp.int32), jnp.bfloat16)
                    t8 = t8 + wa[:8, :128].astype(jnp.float32)
            else:  # u16
                u16 = pltpu.bitcast(u, jnp.uint16)  # [2R, bn]
                for a in range(4):
                    if a == 0:
                        t = (u16 & jnp.uint16(0xF)) | jnp.uint16(0x4300)
                    elif a == 3:
                        t = (u16 >> jnp.uint16(12)) | jnp.uint16(0x4300)
                    else:
                        t = ((u16 >> jnp.uint16(4 * a)) & jnp.uint16(0xF)) | jnp.uint16(0x4300)
                    wa = pltpu.bitcast(t, jnp.bfloat16)
                    t8 = t8 + wa[:8, :128].astype(jnp.float32)
            outs[s][:] = t8 * 1e-18 + refs[0][:]

    x_spec = pl.BlockSpec((8, 128), lambda c, n, k: (0, 0), memory_space=pltpu.VMEM)
    qw_specs = [
        pl.BlockSpec((BK // PF, bn), lambda c, n, k: (c * nk + k, n),
                     memory_space=pltpu.VMEM)
        for _ in range(S)
    ]
    out_specs = [pl.BlockSpec((8, 128), lambda c, n, k: (0, 0), memory_space=pltpu.VMEM)] * S

    def call(xc):
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[x_spec] + qw_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)] * S,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "parallel", "arbitrary"),
            ),
        )(xc, *qws)

    def rep(i, c):
        xc = x8 + c * 1e-30
        outs = call(xc)
        return c + outs[0][0, 0] * 1e-18

    return jax.lax.fori_loop(0, reps, rep, jnp.float32(0.0))


def u16_codes_correct():
    """u16 magic must produce the same code VALUES as u32 magic (different
    row order is fine — the repack absorbs order)."""
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2**31, size=(4, 8), dtype=np.int64).astype(np.uint32)
    # u32 pair extraction
    codes32 = set()
    for a in range(4):
        t = ((u >> np.uint32(4 * a)) & np.uint32(FM))
        codes32.update((t & 0xF).reshape(-1).tolist())
        codes32.update(((t >> 16) & 0xF).reshape(-1).tolist())
    u16 = u.view(np.uint16)
    codes16 = set()
    for a in range(4):
        codes16.update(((u16 >> np.uint16(4 * a)) & np.uint16(0xF)).reshape(-1).tolist())
    assert codes16 == codes32  # same value population
    log("u16 extraction sanity ok")


def main():
    u16_codes_correct()
    rng = np.random.default_rng(1)
    per = K * N * BITS // 8
    C = 32
    reps = max(1, int(np.ceil(0.3 * 819e9 / (C * per))))
    x8 = jnp.zeros((8, 128), jnp.float32)
    for S, mode, bn in (
        (4, "u32", 1024), (4, "u32lite", 1024), (4, "u32half", 1024),
        (2, "u32lite", 1024), (4, "u32lite", 512), (4, "u32half", 512),
    ):
        Ns = N // S
        qws = tuple(
            jnp.asarray(rng.integers(0, 2**31, size=(C * K // PF, Ns), dtype=np.int64).astype(np.int32))
            for _ in range(S)
        )
        try:
            fn = lambda: probe(x8, qws, S=S, mode=mode, bn=min(bn, Ns), reps=reps)
            float(fn())
            best = None
            for _ in range(3):
                t0 = time.time()
                float(fn())
                dt = (time.time() - t0) / (C * reps)
                best = dt if best is None else min(best, dt)
            log(f"  S={S} {mode:7s} bn={bn}: {best*1e6:6.1f} us  {per/best/1e9:5.0f} GB/s")
        except Exception as e:
            log(f"  S={S} {mode:7s} bn={bn}: FAIL {str(e)[:120]}")
    log(f"DONE [t+{time.time()-t_start:.0f}s]")


if __name__ == "__main__":
    main()
