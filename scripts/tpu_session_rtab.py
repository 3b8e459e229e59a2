"""Session RT-A/B (round 4, VERDICT #8): quantify the group-aligned rt
kernel against the legacy interchange-layout kernel on chip.

The r3 VERDICT pointed at the group-aligned-repack NOTE in
pallas_qmatmul.py:80 — that note lives in the LEGACY ``_qmm_kernel``
(interchange layout, asym/desc-act fallback); the proposed design
(per-group partial dots, no per-element scale work) already IS the rt
kernel (``_qmm_rt_kernel``) that serves the decode hot path. This session
records the measured delta between the two on the llama-8B decode shapes
so the item closes with a number instead of an inference, plus the
correctness cross-check.

Method: min-min in-graph scans, one process, weights as jit args,
legacy-first then rt then legacy again (drift bound).
"""
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
from gptqmodel_tpu.ops.pallas_qmatmul import qmatmul, rt_block_k_for

bits, g = 4, 128
M = 8
rng = np.random.default_rng(0)

SHAPES = [(4096, 4096), (4096, 14336), (14336, 4096)]

for K, N in SHAPES:
    G = K // g
    Q = rng.integers(0, 16, size=(K, N), dtype=np.int32)
    qw = packing.pack_qweight(Q, bits)
    bkr = rt_block_k_for(K, g, N=N)
    qw_rt = packing.repack_rt(qw, bits, bkr)
    scales = (rng.random((G, N), np.float32) * 0.01 + 0.005).astype(np.float32)
    zv = np.full((G, N), 8.0, np.float32)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.bfloat16)

    qw_j = jnp.asarray(qw)
    qw_rt_j = jnp.asarray(qw_rt)
    s_j = jnp.asarray(scales, jnp.bfloat16)
    zv_j = jnp.asarray(zv)

    def legacy(xc, w, s, z):
        return qmatmul(xc, w, s, z, bits=bits, group_size=g, rt=False)

    def rtk(xc, w, s, z):
        return qmatmul(xc, w, s, z, bits=bits, group_size=g, rt=True,
                       rt_block_k=bkr, zero_const=8.0)

    # correctness cross-check first
    y_l = np.asarray(jax.jit(legacy)(x, qw_j, s_j, zv_j), np.float32)
    y_r = np.asarray(jax.jit(rtk)(x, qw_rt_j, s_j, zv_j), np.float32)
    rel = float(np.linalg.norm(y_l - y_r) / (np.linalg.norm(y_l) + 1e-9))
    print(f"[{K}x{N}] legacy-vs-rt rel={rel:.2e}", flush=True)

    def timed(fn, w, tag, reps=800, short=80):
        def loop_n(n, x0, w, s, z):
            def body(c, _):
                y = fn(c, w, s, z)
                return (c * jnp.bfloat16(0.999)
                        + y[:, :1].astype(jnp.bfloat16) * 1e-6), ()
            c, _ = jax.lax.scan(body, x0, None, length=n)
            return c

        sfn = jax.jit(functools.partial(loop_n, short))
        lfn = jax.jit(functools.partial(loop_n, short + reps))
        sfn(x, w, s_j, zv_j).block_until_ready()
        lfn(x, w, s_j, zv_j).block_until_ready()
        ts, tl = [], []
        for _ in range(5):
            t0 = time.perf_counter(); sfn(x, w, s_j, zv_j).block_until_ready()
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); lfn(x, w, s_j, zv_j).block_until_ready()
            tl.append(time.perf_counter() - t0)
        us = (min(tl) - min(ts)) / reps * 1e6
        gbs = (K * N * bits / 8 + G * N * 2) / (us * 1e-6) / 1e9
        print(f"[{K}x{N}] {tag}: {us:.2f} us = {gbs:.0f} GB/s packed",
              flush=True)
        return us

    t_l1 = timed(legacy, qw_j, "legacy interchange (first)")
    t_r = timed(rtk, qw_rt_j, "rt group-aligned")
    t_l2 = timed(legacy, qw_j, "legacy interchange (last)")
    print(f"[{K}x{N}] rt speedup vs legacy: "
          f"{min(t_l1, t_l2) / t_r:.3f}x", flush=True)

print("SESSION_RTAB_DONE", flush=True)
