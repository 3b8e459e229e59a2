"""On-chip validation of the 3-bit rt fast path (plane-split layout).

Mosaic parity vs the XLA dequant reference at llama-8B-ish shapes, plus
min-of-3 in-graph timing vs the 4-bit rt kernel (the 3-bit kernel should
run at ~3/4 of the 4-bit kernel's time if it is DMA-bound as designed).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from gptqmodel_tpu.ops import registry
from gptqmodel_tpu.ops.qlinear import make_quant_linear, qlinear_forward_xla

rng = np.random.default_rng(0)
K, N, g = 4096, 28672, 128  # gate|up size: too big for XLA VMEM-pinning across the scan
G = K // g


def module(bits):
    codes = rng.integers(0, 2**bits, size=(N, K), dtype=np.int64)
    scales = rng.uniform(0.005, 0.05, size=(G, N)).astype(np.float16)
    zeros = np.full((G, N), 2 ** (bits - 1), np.int64)
    p = make_quant_linear(Q=codes, scales=scales, zeros=zeros, g_idx=None,
                          bias=None, bits=bits, group_size=g, sym=True)
    return registry.post_init_module(p)


p3, p4 = module(3), module(4)
assert p3.rt_layout and p4.rt_layout

x = jnp.asarray(rng.standard_normal((8, K)), dtype=jnp.bfloat16)
# jit each side into ONE program: eager op storms over the tunnel have
# been observed to wedge on a device response (first rt3 attempt)
ref = np.asarray(jax.jit(qlinear_forward_xla)(p3, x), np.float32)
got = np.asarray(jax.jit(registry.qlinear_forward)(p3, x), np.float32)
rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
print(f"rt3 Mosaic parity vs XLA: rel {rel:.3e}", flush=True)
assert rel < 2e-2, rel


def timed(p, tag, reps=3000):
    import functools

    def loop_n(n, x0, p):
        def body(c, _):
            y = registry.qlinear_forward(p, c)
            return (y[:, :K] * 1e-3 + c * 1e-6).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c

    x0 = jnp.asarray(rng.standard_normal((8, K)), dtype=jnp.bfloat16)
    short = jax.jit(functools.partial(loop_n, 200))
    long = jax.jit(functools.partial(loop_n, 200 + reps))
    short(x0, p).block_until_ready()
    long(x0, p).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); short(x0, p).block_until_ready()
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); long(x0, p).block_until_ready()
        tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / reps)
    pk_bytes = K * N * p.bits // 8 + G * N * 2
    print(f"{tag}: {best*1e6:.1f} us = {pk_bytes/best/1e9:.0f} GB/s packed",
          flush=True)
    return best


t4 = timed(p4, "4-bit rt 4096x28672")
t3 = timed(p3, "3-bit rt 4096x28672")
print(f"ratio 3/4-bit: {t3/t4:.3f} (DMA-bound ideal ~0.77)", flush=True)
print("VERIFY_RT3_DONE", flush=True)
