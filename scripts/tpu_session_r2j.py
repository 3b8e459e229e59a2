"""TPU session J: per-shape (bn, groups-per-tile) tuning sweep for the sym
rt kernel with SOUND timing (1000-iteration scan deltas, median of 3, all
configs paired in one process).

Decode is kernel-BW-bound: 5.77 ms/step vs the 5.57 kernel-only floor at
693 GB/s. Every GB/s here moves the bench directly. Sweep K-tile size
(GPTQ_TPU_RT_GROUPS: 16 = 2048, 32 = 4096, 112 = full-K for the down proj)
and N-tile (GPTQ_TPU_BN) per llama-8B projection shape.
"""

import gc
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

from gptqmodel_tpu.ops import registry
from gptqmodel_tpu.ops.qlinear import make_quant_linear, qlinear_forward_xla

g = 128
M = 8
r = np.random.default_rng(0)


def mk(out_f, in_f, groups_per_tile):
    os.environ["GPTQ_TPU_RT_GROUPS"] = str(groups_per_tile)
    codes = r.integers(0, 16, size=(out_f, in_f), dtype=np.int32)
    scales = r.uniform(0.005, 0.02, size=(in_f // g, out_f)).astype(np.float32)
    zeros = np.full((in_f // g, out_f), 8, np.int32)
    return registry.post_init_module(make_quant_linear(
        Q=codes, scales=scales, zeros=zeros, g_idx=None, bias=None,
        bits=4, group_size=g, sym=True,
    ))


def make_loop(mod, nit, bn):
    from gptqmodel_tpu.ops.pallas_qmatmul import qmatmul

    bk, zc = mod.rt_block_k, mod.zero_const
    os.environ["GPTQ_TPU_BN"] = str(bn)

    @jax.jit
    def loop(x, qw, s):
        def body(c, _):
            y = qmatmul(c, qw, s, s, bits=4, group_size=g, rt=True,
                        rt_block_k=bk, zero_const=zc)
            K_, N_ = c.shape[1], y.shape[1]
            yk = y[:, :K_] if N_ >= K_ else jnp.pad(y, ((0, 0), (0, K_ - N_)))
            c = c + yk.astype(c.dtype) * jnp.asarray(1e-8, c.dtype)
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=nit)
        return jnp.sum(c.astype(jnp.float32))
    return loop


# llama-8B decode projection shapes (K, N)
SHAPES = [("qkvo", 4096, 4096), ("kv", 4096, 1024),
          ("gateup", 4096, 14336), ("down", 14336, 4096)]
_only = os.environ.get("SWEEP_SHAPES")
if _only:
    SHAPES = [s for s in SHAPES if s[0] in _only.split(",")]
GPTS = [8, 16, 32]
BNS = [1024, 2048, 4096]

results = {}
for name, K, N in SHAPES:
    gpt_list = GPTS + ([K // g] if K // g not in GPTS else [])
    for gpt in gpt_list:
        if (K // g) % gpt:
            continue
        for bn in BNS:
            if bn > N:
                continue
            r = np.random.default_rng(hash(name) % 2**31)
            os.environ["GPTQ_TPU_BN"] = str(bn)  # before ANY qmatmul trace
            mod = mk(N, K, gpt)
            x = jnp.asarray(r.standard_normal((M, K)) * 0.3, jnp.bfloat16)
            from gptqmodel_tpu.ops.pallas_qmatmul import qmatmul

            try:
                y = np.asarray(qmatmul(
                    x, mod.qweight, mod.scales, mod.scales, bits=4, group_size=g,
                    rt=True, rt_block_k=mod.rt_block_k, zero_const=mod.zero_const,
                ), np.float32)
            except Exception as e:  # VMEM OOM etc — skip config
                log(f"SKIP {name} gpt={gpt} bn={bn}: {str(e)[:120]}")
                continue
            yx = np.asarray(qlinear_forward_xla(mod, x), np.float32)
            rel = np.linalg.norm(y - yx) / np.linalg.norm(yx)
            assert rel < 2e-2, (name, gpt, bn, rel)
            lo = make_loop(mod, 100, bn)
            hi = make_loop(mod, 1100, bn)
            args = (x, mod.qweight, mod.scales)
            try:
                float(lo(*args)); float(hi(*args))
            except Exception as e:
                log(f"SKIP {name} gpt={gpt} bn={bn}: {str(e)[:120]}")
                continue
            dts = []
            for _ in range(3):
                t0 = time.time(); float(lo(*args)); tl = time.time() - t0
                t0 = time.time(); float(hi(*args)); th = time.time() - t0
                dts.append((th - tl) / 1000)
            dt = sorted(dts)[1]
            bw = (K * N // 2) / dt / 1e9
            results[(name, gpt, bn)] = bw
            log(f"TIME {name} gpt={gpt:3d} bn={bn} K{K} N{N}: "
                f"{dt*1e6:6.1f} us {bw:4.0f} GB/s [t+{time.time()-t_start:.0f}s]")
            del mod, x, lo, hi, args
            gc.collect()

log("==== best per shape ====")
for name, K, N in SHAPES:
    cand = [(cfg, bw) for cfg, bw in results.items() if cfg[0] == name]
    if not cand:
        continue
    best = max(cand, key=lambda t: t[1])
    log(f"{name:7s}: gpt={best[0][1]} bn={best[0][2]} {best[1]:.0f} GB/s")
log("DONE", f"[t+{time.time()-t_start:.0f}s]")
