"""TPU session I: fused-dequant sym rt kernel (GPTQ_TPU_RT_FUSED) A/B.

The per-group sym kernel streams weights at ~693 GB/s on llama-8B decode
shapes (774 practical peak); hypothesis: the per-group dot + f32 acc update
chain underlaps the DMA. The fused variant folds scales into the bf16 weight
tile (one big MXU dot per unpack plane + a single rank-gpk zero-correction
matmul). This script measures both on the three llama-8B projection shapes
at M=8, plus a groups-per-tile sweep for the fused variant.
"""

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
from gptqmodel_tpu.ops.qlinear import make_quant_linear

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
        bits=4, group_size=g, sym=True, scales_dtype=np.float32,
    ))


def make_loop(mod, nit):
    from gptqmodel_tpu.ops.pallas_qmatmul import qmatmul

    bk, zc = mod.rt_block_k, mod.zero_const

    @jax.jit
    def loop(x, qw, s):
        def body(c, _):
            y = qmatmul(c, qw, s, s, bits=4, group_size=g, rt=True,
                        rt_block_k=bk, zero_const=zc)
            # fold y back into x ELEMENTWISE so the scan can't DCE or
            # pipeline the kernels (pad/slice to match widths)
            K_, N_ = c.shape[1], y.shape[1]
            yk = y[:, :K_] if N_ >= K_ else jnp.pad(y, ((0, 0), (0, K_ - N_)))
            c = c + yk.astype(c.dtype) * jnp.asarray(1e-8, c.dtype)
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=nit)
        return jnp.sum(c.astype(jnp.float32))
    return loop


SHAPES = [("qkvo4096", 4096, 4096), ("gateup", 4096, 14336),
          ("down", 14336, 4096)]

results = {}
for fused in ("0", "1"):
    os.environ["GPTQ_TPU_RT_FUSED"] = fused
    gpt_list = [16] if fused == "0" else [16, 32]
    for gpt in gpt_list:
        jax.clear_caches()
        tag = f"fused={fused} gpt={gpt}"
        for name, K, N in SHAPES:
            r = np.random.default_rng(hash(name) % 2**31)  # same weights per shape
            mod = mk(N, K, gpt)
            x = jnp.asarray(r.standard_normal((M, K)) * 0.3, jnp.bfloat16)
            # correctness cross-check vs the XLA reference path
            from gptqmodel_tpu.ops.pallas_qmatmul import qmatmul
            from gptqmodel_tpu.ops.qlinear import qlinear_forward_xla

            y = np.asarray(qmatmul(
                x, mod.qweight, mod.scales, mod.scales, bits=4, group_size=g,
                rt=True, rt_block_k=mod.rt_block_k, zero_const=mod.zero_const,
            ), np.float32)
            yx = np.asarray(qlinear_forward_xla(mod, x), np.float32)
            rel = np.linalg.norm(y - yx) / np.linalg.norm(yx)
            log(f"  corr {tag} {name} vs xla: rel={rel:.2e}")
            assert rel < 2e-2, (tag, name, rel)
            lo, hi = make_loop(mod, 20), make_loop(mod, 220)
            args = (x, mod.qweight, mod.scales)
            float(lo(*args)); float(hi(*args))
            dts = []
            for _ in range(3):
                t0 = time.time(); float(lo(*args)); tl = time.time() - t0
                t0 = time.time(); float(hi(*args)); th = time.time() - t0
                dts.append((th - tl) / 200)
            dt = sorted(dts)[1]
            bw = (K * N // 2) / dt / 1e9
            results[(tag, name)] = bw
            log(f"TIME {tag} {name} K{K} N{N}: {dt*1e6:.1f} us, "
                f"{bw:.0f} GB/s packed [t+{time.time()-t_start:.0f}s]")
            del mod, x, lo, hi, args
            import gc; gc.collect()

log("==== summary ====")
for (tag, name), bw in sorted(results.items()):
    log(f"{tag:18s} {name:9s} {bw:6.0f} GB/s")
log("DONE", f"[t+{time.time()-t_start:.0f}s]")
