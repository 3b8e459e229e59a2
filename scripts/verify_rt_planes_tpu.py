"""On-chip validation of the plane-split rt kernels (3/5/6/7-bit).

Mosaic parity vs the XLA dequant reference at gate|up shapes, plus
min-min in-graph timing vs the 4-bit rt kernel — each width should track
DMA-proportional time (bits/4 of the 4-bit kernel) plus the extra plane
extraction cost.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from gptqmodel_tpu.ops import registry
from gptqmodel_tpu.ops.qlinear import make_quant_linear, qlinear_forward_xla

rng = np.random.default_rng(0)
K, N, g = 4096, 28672, 128
G = K // g


def module(bits):
    codes = rng.integers(0, 2**bits, size=(N, K), dtype=np.int64)
    scales = rng.uniform(0.005, 0.05, size=(G, N)).astype(np.float16)
    zeros = np.full((G, N), 2 ** (bits - 1), np.int64)
    p = make_quant_linear(Q=codes, scales=scales, zeros=zeros, g_idx=None,
                          bias=None, bits=bits, group_size=g, sym=True)
    return registry.post_init_module(p)


def timed(p, tag, reps=3000, short=200):
    def loop_n(n, x0, p):
        def body(c, _):
            y = registry.qlinear_forward(p, c)
            return (y[:, :K] * 1e-3 + c * 1e-6).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c

    x0 = jnp.asarray(rng.standard_normal((8, K)), dtype=jnp.bfloat16)
    sfn = jax.jit(functools.partial(loop_n, short))
    lfn = jax.jit(functools.partial(loop_n, short + reps))
    sfn(x0, p).block_until_ready()
    lfn(x0, p).block_until_ready()
    ts, tl = [], []
    for _ in range(5):
        t0 = time.perf_counter(); sfn(x0, p).block_until_ready()
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); lfn(x0, p).block_until_ready()
        tl.append(time.perf_counter() - t0)
    best = (min(tl) - min(ts)) / reps
    pk = K * N * p.bits // 8 + G * N * 2
    print(f"{tag}: {best*1e6:.1f} us = {pk/best/1e9:.0f} GB/s packed",
          flush=True)
    return best


p4 = module(4)
t4 = None
for bits in (4, 3, 5, 6, 7):
    p = module(bits) if bits != 4 else p4
    assert p.rt_layout, bits
    x = jnp.asarray(rng.standard_normal((8, K)), dtype=jnp.bfloat16)
    ref = np.asarray(jax.jit(qlinear_forward_xla)(p, x), np.float32)
    got = np.asarray(jax.jit(registry.qlinear_forward)(p, x), np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    print(f"{bits}-bit Mosaic parity vs XLA: rel {rel:.3e}", flush=True)
    assert rel < 2e-2, (bits, rel)
    t = timed(p, f"{bits}-bit rt 4096x28672")
    if bits == 4:
        t4 = t
    else:
        print(f"   vs 4-bit: {t/t4:.3f} (DMA-proportional ideal "
              f"{bits/4:.2f})", flush=True)
print("VERIFY_RT_PLANES_DONE", flush=True)
