"""Round-2 TPU session A: verify drive + kernel validation + decode A/B.

ONE script for the whole TPU visit (lease discipline): every section prints
progress with flush so the host can poll the log. Sections:

1. verify: canonical quantize -> pack -> quantized forward drive.
2. kernels: rt4 guard, NEW rt8 (f32-magic) + conv8 timings at 4096^2,
   fused decode-attention correctness (bf16 + int8 KV).
3. decode A/B at llama-8B scale: {attn xla|pallas} x {kv bf16|int8}.

Timing = in-graph scan with a data dependency + differential loop lengths
(the relay's block_until_ready is not trustworthy).
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

from gptqmodel_tpu.ops.qlinear import make_quant_linear, qlinear_forward_xla

# ------------------------------------------------------------- 2. kernels
from gptqmodel_tpu.ops import pack as packing
from gptqmodel_tpu.ops import registry
from gptqmodel_tpu.ops.pallas_qmatmul import qmatmul, rt_block_k_for


def make_module(bits, K, N, g=128, seed=0):
    r = np.random.default_rng(seed)
    codes = r.integers(0, 2**bits, size=(N, K), dtype=np.int64)
    G = K // g
    scales = r.uniform(0.005, 0.05, size=(G, N)).astype(np.float16)
    zeros = r.integers(0, 2**bits, size=(G, N), dtype=np.int64)
    m = make_quant_linear(Q=codes, scales=scales, zeros=zeros, g_idx=None,
                          bias=None, bits=bits, group_size=g, sym=False)
    return registry.post_init_module(m)


def check_kernel(m, M=8, tag=""):
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((M, m.in_features)), dtype=jnp.bfloat16)
    ref = np.asarray(qlinear_forward_xla(m, x), dtype=np.float32)
    registry.set_backend("pallas")
    try:
        got = np.asarray(registry.qlinear_forward(m, x), dtype=np.float32)
    finally:
        registry.set_backend("auto")
    relk = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    log(f"KERNEL {tag} rel vs XLA: {relk:.5f} [t+{time.time()-t_start:.0f}s]")
    assert relk < 2e-2, (tag, relk)


def time_qmatmul(m, M=8, iters=(100, 1100), tag=""):
    K = m.in_features
    r = np.random.default_rng(2)
    x0 = jnp.asarray(r.standard_normal((M, K)), dtype=jnp.bfloat16)

    def make(nit):
        @jax.jit
        def loop(x, qw, s, z):
            def body(c, _):
                y = qmatmul(c, qw, s, z, bits=m.bits, group_size=m.group_size,
                            rt=m.rt_layout)
                c = c + y[:, :K].astype(c.dtype) * jnp.asarray(1e-8, c.dtype)
                return c, ()
            c, _ = jax.lax.scan(body, x, None, length=nit)
            return jnp.sum(c.astype(jnp.float32))
        return loop

    lo, hi = make(iters[0]), make(iters[1])
    args = (x0, m.qweight, m.scales.astype(jnp.float32), m.zvals)
    float(lo(*args)); float(hi(*args))  # compile both
    dts = []
    for _ in range(3):  # median of 3: tunnel latency noise is ~0.5ms
        t0 = time.time(); float(lo(*args)); t_lo = time.time() - t0
        t0 = time.time(); float(hi(*args)); t_hi = time.time() - t0
        dts.append((t_hi - t_lo) / (iters[1] - iters[0]))
    dt = sorted(dts)[1]
    gbps = (K * m.out_features * m.bits / 8) / dt / 1e9
    log(f"TIME {tag}: {dt*1e6:.1f} us/call, packed {gbps:.0f} GB/s "
        f"[t+{time.time()-t_start:.0f}s]")
    return dt


# rt4 guard (must still be ~12-14us)
m4 = make_module(4, 4096, 4096)
assert m4.rt_layout
check_kernel(m4, tag="rt4 4096^2")
time_qmatmul(m4, tag="rt4 4096^2")

# NEW: 8-bit rt (f32 magic) vs old convert path
m8 = make_module(8, 4096, 4096)
assert m8.rt_layout, "8-bit should now take the rt path"
check_kernel(m8, tag="rt8 4096^2")
t_rt8 = time_qmatmul(m8, tag="rt8 4096^2 (f32 magic)")
# old convert path for timing A/B: same shapes, rt flag off (timing is
# layout-insensitive; outputs of this variant are not checked)
import dataclasses

m8c = dataclasses.replace(
    make_module(8, 4096, 4096), rt_layout=False, rt_block_k=0
)
t_c8 = time_qmatmul(m8c, tag="conv8 4096^2 (old convert)")
log(f"rt8 speedup vs convert: {t_c8/t_rt8:.2f}x")
del m4, m8, m8c
gc.collect()

# fused decode attention: correctness on-chip
from gptqmodel_tpu.ops.pallas_attention import decode_attention

B, Hkv, rep, L, D = 8, 8, 4, 256, 128
r = np.random.default_rng(3)
q = jnp.asarray(r.standard_normal((B, Hkv, rep, D)), jnp.bfloat16)
kc = jnp.asarray(r.standard_normal((B, Hkv, L, D)), jnp.bfloat16)
vc = jnp.asarray(r.standard_normal((B, Hkv, L, D)), jnp.bfloat16)
valid = np.zeros((B, L), np.float32)
valid[:, : L // 2] = 1
bias = jnp.asarray(np.where(valid > 0, 0.0, np.float32(np.finfo(np.float32).min)))


@jax.jit
def attn_ref(q, kc, vc, bias):
    logits = jnp.einsum("bhrd,bhkd->bhrk", q, kc,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    logits = logits + bias[:, None, None, :]
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhrk,bhkd->bhrd", p, vc)


ref = np.asarray(attn_ref(q, kc, vc, bias), np.float32)
got = np.asarray(decode_attention(q, kc, vc, bias, scale=D ** -0.5), np.float32)
rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
log(f"ATTN fused bf16 rel vs XLA: {rel:.5f} [t+{time.time()-t_start:.0f}s]")
assert rel < 2e-2, rel

# int8 variant
ki = np.clip(np.round(np.asarray(kc, np.float32) / 0.01), -127, 127)
ks = jnp.full((B, Hkv, L), 0.01, jnp.float32)
kc8 = jnp.asarray(ki, jnp.int8)
vi = np.clip(np.round(np.asarray(vc, np.float32) / 0.01), -127, 127)
vc8 = jnp.asarray(vi, jnp.int8)
ref8 = np.asarray(
    attn_ref(q, (kc8.astype(jnp.float32) * 0.01).astype(jnp.bfloat16),
             (vc8.astype(jnp.float32) * 0.01).astype(jnp.bfloat16), bias),
    np.float32,
)
got8 = np.asarray(
    decode_attention(q, kc8, vc8, bias, ks, ks, scale=D ** -0.5), np.float32
)
rel8 = np.linalg.norm(got8 - ref8) / np.linalg.norm(ref8)
log(f"ATTN fused int8 rel vs XLA: {rel8:.5f} [t+{time.time()-t_start:.0f}s]")
assert rel8 < 2e-2, rel8
del q, kc, vc, kc8, vc8, ref, got, ref8, got8
gc.collect()

# ------------------------------------------------- 3. decode A/B (llama-8B)
from bench import build_quant_params_on_device, packed_model_bytes
from gptqmodel_tpu.inference.engine import (
    init_kv_cache,
    make_decode_fn,
    make_prefill_fn,
)
from gptqmodel_tpu.utils.testing import llama8b_spec

spec = llama8b_spec(layers=32)
Bq, T, steps, max_len = 8, 128, 32, 256
params = build_quant_params_on_device(spec, 4, 128)
log(f"8B params on device ({packed_model_bytes(spec, 4, 128)/1e9:.2f} GB) "
    f"[t+{time.time()-t_start:.0f}s]")

prefill = make_prefill_fn(spec, jnp.bfloat16)
decode = make_decode_fn(spec, jnp.bfloat16)
roof_steps = 819e9 / packed_model_bytes(spec, 4, 128)

results = {}
for kv_quant in (False, True):
    caches0 = init_kv_cache(spec, Bq, max_len, jnp.bfloat16, kv_quant=kv_quant)
    ids = jnp.asarray(np.ones((Bq, T), np.int32))
    lens = jnp.full((Bq,), T, jnp.int32)
    logits, caches0, key_valid = prefill(params, ids, lens, caches0)
    logits.block_until_ready()
    log(f"prefill kv_quant={kv_quant} done [t+{time.time()-t_start:.0f}s]")
    token = jnp.argmax(logits, axis=-1)
    pos = lens

    for attn in ("xla", "auto"):
        registry.set_attention_backend(attn)

        def make_loop(nsteps):
            @jax.jit
            def loop(params, token, pos, key_valid, caches):
                def body(carry, s):
                    token, pos, key_valid, caches = carry
                    lg, caches, key_valid = decode(
                        params, token, pos, T + s, key_valid, caches
                    )
                    token = jnp.argmax(lg, axis=-1)
                    return (token, pos + 1, key_valid, caches), token[0]
                (token, pos, key_valid, caches), toks = jax.lax.scan(
                    body, (token, pos, key_valid, caches), jnp.arange(nsteps)
                )
                return toks.sum()
            return loop

        warm, timed = make_loop(2), make_loop(2 + steps)
        args = (params, token, pos, key_valid, caches0)
        float(warm(*args)); float(timed(*args))
        t0 = time.time(); float(warm(*args)); t_w = time.time() - t0
        t0 = time.time(); float(timed(*args)); t_t = time.time() - t0
        step_t = (t_t - t_w) / steps
        frac = (1.0 / step_t) / roof_steps
        results[(attn, kv_quant)] = step_t
        log(f"DECODE attn={attn} kv_int8={kv_quant}: {step_t*1e3:.2f} ms/step, "
            f"{Bq/step_t:.0f} tok/s, {frac*100:.1f}% roofline "
            f"[t+{time.time()-t_start:.0f}s]")
        registry.set_attention_backend("auto")
    del caches0
    gc.collect()

log("SUMMARY", {f"{a}/{'i8' if k else 'bf16'}": round(v * 1e3, 2)
                for (a, k), v in results.items()})
log(f"DONE [t+{time.time()-t_start:.0f}s]")
