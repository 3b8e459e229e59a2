"""TPU session N (v2): practical HBM streaming ceiling on this chip.

Session M: the rt kernel is pure-DMA-bound at ~672 GB/s (82% of 819
nominal) at every llama shape and block geometry. Is 672 the chip's
practical ceiling? Compare against XLA's OWN streaming paths:

  dense-matmul — [8,K] @ [K,N] bf16, rotating copies (the classic
                 decode-shaped weight stream; XLA pipelines this itself)
  dense-f32    — same in f32 (2x bytes)
  gather-free xla-copy — y = x + 1 on 1 GB (read+write)

If dense bf16 matmul ALSO runs ~670 GB/s, the chip's achievable stream
rate is ~672 and the kernel is AT the hardware roofline (the 819 number
is nameplate, not achievable).
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

log("devices:", jax.devices(), f"[t+{time.time()-t_start:.0f}s]")

GB = 1e9


@functools.partial(jax.jit, static_argnames=("reps",))
def dense_stream(x, ws, *, reps):
    """ws [C, K, N]; per rep scan all copies: y = x @ w (stream the weight)."""

    def body(c, w):
        xc = x + c * jnp.bfloat16(1e-30)
        y = jnp.dot(xc, w, preferred_element_type=jnp.float32)
        return c + y[0, 0].astype(jnp.float32) * 1e-18, 0

    def rep(i, c):
        out, _ = jax.lax.scan(body, c, ws)
        return out

    return jax.lax.fori_loop(0, reps, rep, jnp.float32(0.0))


@functools.partial(jax.jit, static_argnames=("reps",))
def xla_copy(x, *, reps):
    def rep(i, y):
        return y + jnp.int32(1)

    y = jax.lax.fori_loop(0, reps, rep, x)
    return (y[0, 0] - reps).astype(jnp.float32)


def timeit(fn, total_bytes, n=3):
    float(fn())
    best = None
    for _ in range(n):
        t0 = time.time()
        float(fn())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return total_bytes / best / GB


def main():
    rng = np.random.default_rng(0)

    for dt_name, dtype, itemsize in (("bf16", jnp.bfloat16, 2), ("f32", jnp.float32, 4)):
        K, N = 4096, 14336
        per = K * N * itemsize
        C = max(2, int(np.ceil(512e6 / per)))
        reps = max(1, int(np.ceil(0.4 * 819e9 / (C * per))))
        ws = jnp.asarray(
            rng.standard_normal((C, K, N)).astype(np.float32), dtype
        )
        x = jnp.asarray(rng.standard_normal((8, K)).astype(np.float32), dtype)
        gbs = timeit(
            lambda: dense_stream(x, ws, reps=reps), C * reps * per
        )
        log(f"dense-matmul {dt_name}: {gbs:6.0f} GB/s weight stream "
            f"(C={C} reps={reps}, {per/1e6:.0f} MB each)")

    rows, cols = 1 << 17, 2048  # 1 GB
    big = jnp.asarray(
        rng.integers(0, 2**31, size=(rows, cols), dtype=np.int64).astype(np.int32)
    )
    reps = 8
    gbs = timeit(lambda: xla_copy(big, reps=reps), 2 * rows * cols * 4 * reps)
    log(f"xla-copy        : {gbs:6.0f} GB/s read+write")
    log(f"DONE [t+{time.time()-t_start:.0f}s]")


if __name__ == "__main__":
    main()
