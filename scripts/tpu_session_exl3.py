"""Session EXL3 (round 4, VERDICT missing #4): measure-or-cut for a
packed-streaming trellis decode kernel on TPU.

The EXL3 serve path currently decodes the trellis once at post-init into a
cached dense bf16 array (ops/trellis.py) — decode then streams 16
bits/weight. A streaming kernel would stream K bits/weight but must pay,
per weight, the ring-window extraction (~4 VPU ops), the procedural mcg
codebook (mult/and/xor + two f16->f32 bitcast-converts + add ≈ 6 ops), and
the m16n16 tensor-core de-permutation (a 256x256 one-hot MXU dot per tile).
Estimate: ~13 VPU ops/weight -> ~148 GB/s packed on the v5e VPU
(3.85e12 ops/s), BELOW the ~175 GB/s parity point with the convert path
(dense bf16 at the 700 GB/s wall = 350 Gweight/s).

This kernel executes a REPRESENTATIVE op sequence (same op count/types/
layout as the exact decode, numerics unchecked) over real-sized trellis
words to measure the achievable packed-consumption rate — the decode-
attention precedent: measure, and cut if parity-or-worse.

K=4 (mcg codebook), tiles of llama-8B o_proj shape: [4096, 4096] weights
= 16 MB trellis words (int16 [k/16, n/16, 64]).
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

KBITS = 4
Kf, Nf = 16384, 16384  # 134 MB packed: cannot be VMEM-pinned across the scan
# trellis words int16 [k/16 * n/16, 16*K] -> store as u32 [k*n/512, 256]
# rows for clean tiling: each 256-weight tile holds 16*K int16 = 32 u32
rng = np.random.default_rng(0)
n_tiles = (Kf // 16) * (Nf // 16)
words = rng.integers(0, 2**32, size=(n_tiles, 32), dtype=np.uint64).astype(
    np.uint32).view(np.int32)
words_j = jnp.asarray(words)  # [65536, 32] int32 = 8 MB packed (4 b/w)
perm_j = jnp.asarray(np.eye(256, dtype=np.float32)[
    rng.permutation(256)], jnp.bfloat16)  # stand-in one-hot perm

BT = 2048  # tile rows per grid step: 2048*32*4 = 256 KB blocks


def kern(w_ref, p_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    u = w_ref[:].astype(jnp.uint32)  # [BT, 32]
    # representative decode: per tile-row, expand 32 u32 words into 256
    # windows (8 windows per word-pair band) via shift/or/and chains, then
    # the procedural mcg codebook. Layout: build 8 window banks [BT, 32].
    vals = []
    for b in range(8):  # 8 banks x 32 lanes = 256 windows/row
        sh = jnp.uint32(4 * b)
        w1 = (u << sh) | (u >> (jnp.uint32(32) - sh - jnp.uint32(1)) >> 1)
        win = (w1 >> jnp.uint32(8)) & jnp.uint32(0xFFFF)  # window extract
        v = (win * jnp.uint32(0xCBAC1FED)) & jnp.uint32(0xFFFFFFFF)  # mcg
        v = (v & jnp.uint32(0x8FFF8FFF)) ^ jnp.uint32(0x3B603B60)
        # two f16 halves -> f32 add (representative: bf16 bitcast + convert)
        lo = pltpu.bitcast((v & jnp.uint32(0xFFFF)).astype(jnp.int32) << 16,
                           jnp.float32)
        hi = pltpu.bitcast((v & jnp.uint32(0xFFFF0000)).astype(jnp.int32),
                           jnp.float32)
        vals.append((lo + hi).astype(jnp.bfloat16))
    dec = jnp.concatenate(vals, axis=1)  # [BT, 256] decoded tile values
    # m16n16 de-permutation: one-hot [256, 256] MXU dot per tile batch.
    # The accumulate REDUCES over all BT rows — a [:8] slice here let
    # Mosaic DCE the unused rows and narrow the block loads to 8 rows
    # (measured as an impossible 24 PB/s before the fix)
    pd = jnp.dot(dec, p_ref[:].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    o_ref[:] += pd.reshape(-1, 8, 256).sum(axis=0)


@jax.jit
def run(words, perm):
    nt = words.shape[0]
    return pl.pallas_call(
        kern,
        grid=(nt // BT,),
        in_specs=[
            pl.BlockSpec((BT, 32), lambda i: (i, 0)),
            pl.BlockSpec((256, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 256), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
    )(words, perm)


def timed(reps=300, short=30):
    def loop_n(n, w, p):
        def body(c, _):
            y = run(w, c)
            return (c * jnp.bfloat16(0.999)
                    + y.astype(jnp.bfloat16)[0][None, :] * 1e-6), ()
        c, _ = jax.lax.scan(body, p, None, length=n)
        return c

    sfn = jax.jit(functools.partial(loop_n, short))
    lfn = jax.jit(functools.partial(loop_n, short + reps))
    sfn(words_j, perm_j).block_until_ready()
    lfn(words_j, perm_j).block_until_ready()
    ts, tl = [], []
    for _ in range(5):
        t0 = time.perf_counter(); sfn(words_j, perm_j).block_until_ready()
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); lfn(words_j, perm_j).block_until_ready()
        tl.append(time.perf_counter() - t0)
    print("short:", [f"{v:.4f}" for v in ts], flush=True)
    print("long :", [f"{v:.4f}" for v in tl], flush=True)
    return (min(tl) - min(ts)) / reps


# sanity: one eager call must cost at least the RPC + kernel time
for _ in range(3):
    t0 = time.perf_counter()
    y = run(words_j, perm_j)
    y.block_until_ready()
    print(f"eager call: {(time.perf_counter()-t0)*1e3:.1f} ms  "
          f"out[0,:3]={np.asarray(y)[0,:3]}", flush=True)

t = timed()
packed_bytes = words.size * 4
gbs = packed_bytes / t / 1e9
gwps = (Kf * Nf) / t / 1e9
print(f"streaming trellis-decode representative kernel: {t*1e6:.1f} us for "
      f"{packed_bytes/2**20:.0f} MiB packed = {gbs:.0f} GB/s packed "
      f"({gwps:.0f} Gweight/s)", flush=True)
conv = 700e9 / 2  # convert path: bf16 2 B/weight at the 700 GB/s wall
print(f"convert-path rate: {conv/1e9:.0f} Gweight/s -> streaming/convert = "
      f"{gwps*1e9/conv:.2f}x", flush=True)
print("SESSION_EXL3_DONE", flush=True)
