"""Round-2 TPU session E: sym-kernel decode measurement (final bench check).

The sym fast path (zvals-free, bf16 scales) cuts non-code HBM bytes from
12.5% of packed to ~3%; measure the llama-8B decode with tile16 + sym path,
plus the 4096^2 micro number.
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
from gptqmodel_tpu.ops.pallas_qmatmul import qmatmul
from gptqmodel_tpu.ops.qlinear import make_quant_linear, qlinear_forward_xla


def make_sym_module(bits, K, N, g=128, seed=0):
    r = np.random.default_rng(seed)
    codes = r.integers(0, 2**bits, size=(N, K), dtype=np.int64)
    G = K // g
    scales = r.uniform(0.005, 0.05, size=(G, N)).astype(np.float16)
    zeros = np.full((G, N), 2 ** (bits - 1), np.int64)
    m = make_quant_linear(Q=codes, scales=scales, zeros=zeros, g_idx=None,
                          bias=None, bits=bits, group_size=g, sym=True)
    return registry.post_init_module(m)


def time_qmatmul(m, M=8, iters=(100, 1100), tag=""):
    K = m.in_features
    r = np.random.default_rng(2)
    x0 = jnp.asarray(r.standard_normal((M, K)), dtype=jnp.bfloat16)

    def make(nit):
        @jax.jit
        def loop(x, qw, s, z):
            def body(c, _):
                y = qmatmul(c, qw, s, z, bits=m.bits, group_size=m.group_size,
                            rt=m.rt_layout, rt_block_k=m.rt_block_k,
                            zero_const=m.zero_const)
                mm = min(K, y.shape[1])
                c = c.at[:, :mm].add(y[:, :mm].astype(c.dtype)
                                     * jnp.asarray(1e-8, c.dtype))
                return c, ()
            c, _ = jax.lax.scan(body, x, None, length=nit)
            return jnp.sum(c.astype(jnp.float32))
        return loop

    lo, hi = make(iters[0]), make(iters[1])
    args = (x0, m.qweight, m.scales.astype(jnp.float32), m.zvals)
    float(lo(*args)); float(hi(*args))
    dts = []
    for _ in range(3):
        t0 = time.time(); float(lo(*args)); t_lo = time.time() - t0
        t0 = time.time(); float(hi(*args)); t_hi = time.time() - t0
        dts.append((t_hi - t_lo) / (iters[1] - iters[0]))
    dt = sorted(dts)[1]
    gbps = (K * m.out_features * m.bits / 8) / dt / 1e9
    log(f"TIME {tag}: {dt*1e6:.1f} us, {gbps:.0f} GB/s [t+{time.time()-t_start:.0f}s]")
    return dt


m = make_sym_module(4, 4096, 4096)
assert m.rt_layout and m.zero_const == 8.0
# correctness on-chip
r = np.random.default_rng(1)
x = jnp.asarray(r.standard_normal((8, 4096)), jnp.bfloat16)
ref = np.asarray(qlinear_forward_xla(m, x), np.float32)
registry.set_backend("pallas")
try:
    got = np.asarray(registry.qlinear_forward(m, x), np.float32)
finally:
    registry.set_backend("auto")
rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
log(f"CHECK rt4-sym: rel {rel:.5f}")
assert rel < 1.5e-2, rel
time_qmatmul(m, tag="rt4-sym 4096^2 tile16")
del m
gc.collect()

# full decode (same config the driver bench runs)
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
prefill = make_prefill_fn(spec, jnp.bfloat16)
decode = make_decode_fn(spec, jnp.bfloat16)
caches = init_kv_cache(spec, Bq, max_len, jnp.bfloat16)
ids = jnp.asarray(np.ones((Bq, T), np.int32))
lens = jnp.full((Bq,), T, jnp.int32)
logits, caches, key_valid = prefill(params, ids, lens, caches)
logits.block_until_ready()
token = jnp.argmax(logits, axis=-1)
pos = lens


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
args = (params, token, pos, key_valid, caches)
float(warm(*args)); float(timed(*args))
t0 = time.time(); float(warm(*args)); t_w = time.time() - t0
t0 = time.time(); float(timed(*args)); t_t = time.time() - t0
step_t = (t_t - t_w) / steps
roof = 819e9 / packed_model_bytes(spec, 4, 128)
log(f"DECODE 32L sym tile16: {step_t*1e3:.2f} ms/step, {Bq/step_t:.0f} tok/s, "
    f"{(1/step_t)/roof*100:.1f}% roofline [t+{time.time()-t_start:.0f}s]")
log(f"DONE [t+{time.time()-t_start:.0f}s]")
