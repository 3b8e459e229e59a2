"""Session Z14 (round 4): (a) asym plane-bits XLA-path rate evidence
(VERDICT r3 missing #5) + (b) MoE step decomposition via layer scaling.

(a) The 3/5/6/7-bit ASYM path is XLA dequant->matmul (the plane-split rt
    kernels are sym-only, like the reference's Marlin). Measure its
    effective packed GB/s at llama-8B decode shapes vs the sym rt kernel —
    the "is XLA at the wall here?" number the decode-attention cut got.

(b) Fit per-layer slope + intercept from 16L vs 8L Qwen3-30B-shaped MoE
    decode in ONE process (64-step scans, min-min): slope - kernel(175.7)
    - attn/router bytes = the non-MoE per-layer glue; intercept = embed +
    lm_head + step glue.
"""
import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

# ---------------- (a) asym plane-bits XLA rate
from gptqmodel_tpu.ops import pack as packing
from gptqmodel_tpu.ops.qlinear import QuantLinear, qlinear_forward_xla
from gptqmodel_tpu.ops.registry import post_init_module, qlinear_forward

rng = np.random.default_rng(0)
M, K, N, g = 8, 4096, 14336, 128
G = K // g


def build(bits, sym):
    Q = rng.integers(0, 2 ** bits, size=(K, N), dtype=np.int64)
    scales = (rng.random((G, N)) * 0.01 + 0.005).astype(np.float16)
    if sym:
        zeros = np.full((G, N), 2 ** (bits - 1), np.int64)
    else:
        zeros = rng.integers(1, 2 ** bits - 1, size=(G, N), dtype=np.int64)
    planar = bits in (5, 6, 7)
    qw = (packing.planar_pack_axis0(Q.astype(np.int32), bits) if planar
          else packing.pack_qweight(np.ascontiguousarray(Q), bits))
    qz = (packing.planar_pack_axis0(zeros.T.astype(np.int32), bits).T
          if planar else packing.pack_qzeros(zeros, bits, v1=False))
    p = QuantLinear(
        qweight=jnp.asarray(qw), qzeros=jnp.asarray(qz),
        scales=jnp.asarray(scales, jnp.float16), g_idx=None, bias=None,
        bits=bits, group_size=g, in_features=K, out_features=N,
        sym=sym, v1=False, planar=planar)
    return post_init_module(p)


def timed_fwd(p, tag, reps=200, short=20):
    x0 = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.bfloat16)

    def loop_n(n, x0, qw, qz, sc, zv):
        import dataclasses
        pp = dataclasses.replace(p, qweight=qw, qzeros=qz, scales=sc,
                                 zvals=zv)

        def body(c, _):
            y = qlinear_forward(pp, c)
            return (c * jnp.bfloat16(0.999)
                    + y[:, :1].astype(jnp.bfloat16) * 1e-6), ()
        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c

    args = (x0, p.qweight, p.qzeros, p.scales, p.zvals)
    sfn = jax.jit(functools.partial(loop_n, short))
    lfn = jax.jit(functools.partial(loop_n, short + reps))
    try:
        sfn(*args).block_until_ready()
        lfn(*args).block_until_ready()
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
        return None
    ts, tl = [], []
    for _ in range(5):
        t0 = time.perf_counter(); sfn(*args).block_until_ready()
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); lfn(*args).block_until_ready()
        tl.append(time.perf_counter() - t0)
    us = (min(tl) - min(ts)) / reps * 1e6
    bits = p.bits
    gbs = (K * N * bits / 8) / (us * 1e-6) / 1e9
    print(f"{tag}: {us:.1f} us = {gbs:.0f} GB/s packed-codes "
          f"(wall-equivalent time {K*N*bits/8/700e9*1e6:.1f} us)", flush=True)
    return us


for bits in (5, 6, 3):
    t_sym = timed_fwd(build(bits, sym=True), f"{bits}-bit SYM (rt kernel)")
    t_asym = timed_fwd(build(bits, sym=False), f"{bits}-bit ASYM (XLA path)")
    if t_sym and t_asym:
        print(f"{bits}-bit asym/sym slowdown: {t_asym/t_sym:.2f}x", flush=True)

# ---------------- (b) MoE layer-count scaling
os.environ.setdefault("BENCH_MOE_DIVERSE", "1")
import bench_moe
from gptqmodel_tpu.inference.engine import (
    init_kv_cache, make_decode_fn, make_prefill_fn)

B, T, steps, max_len = 8, 64, 64, 192
results = {}
for layers in (16, 8):
    spec = bench_moe.qwen3_30b_spec(layers)
    params = bench_moe.build_params(spec)
    prefill = make_prefill_fn(spec, jnp.bfloat16)
    decode = make_decode_fn(spec, jnp.bfloat16)
    caches = init_kv_cache(spec, B, max_len, jnp.bfloat16, kv_quant="int8")
    rr = np.random.default_rng(7)
    ids = jnp.asarray(rr.integers(1, spec.vocab_size, size=(B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    logits, caches, key_valid = prefill(params, ids, lens, caches)
    token = jnp.argmax(logits, axis=-1)
    forced = jnp.asarray(
        rr.integers(1, spec.vocab_size, size=(2 + steps, B)), jnp.int32)

    def make_loop(n, decode=decode, spec=spec, forced=forced):
        @jax.jit
        def loop(params, token, pos, key_valid, caches):
            def body(carry, s):
                token, pos, key_valid, caches = carry
                logits, caches, key_valid = decode(
                    params, token, pos, T + s, key_valid, caches)
                token = (forced[s] + jnp.argmax(logits, -1).astype(jnp.int32)
                         ) % (spec.vocab_size - 1) + 1
                return (token, pos + 1, key_valid, caches), logits[0, 0]
            carry, xs = jax.lax.scan(
                body, (token, pos, key_valid, caches), jnp.arange(n))
            return xs.sum()
        return loop

    warm, timedl = make_loop(2), make_loop(2 + steps)
    float(warm(params, token, lens, key_valid, caches))
    float(timedl(params, token, lens, key_valid, caches))
    tw, tt = [], []
    for _ in range(5):
        t0 = time.time(); float(warm(params, token, lens, key_valid, caches))
        tw.append(time.time() - t0)
        t0 = time.time(); float(timedl(params, token, lens, key_valid, caches))
        tt.append(time.time() - t0)
    ms = (min(tt) - min(tw)) / steps * 1e3
    results[layers] = ms
    print(f"{layers}L decode: {ms:.3f} ms/step", flush=True)
    del params, caches

slope = (results[16] - results[8]) / 8  # ms per layer
intercept = results[8] - 8 * slope
print(f"per-layer {slope*1e3:.1f} us; intercept (embed+lm_head+glue) "
      f"{intercept*1e3:.0f} us", flush=True)
print(f"per-layer minus kernel(175.7) minus attn/router bytes(15.2) = "
      f"{slope*1e3 - 175.7 - 15.2:.1f} us/layer of glue", flush=True)
print("SESSION_Z14_DONE", flush=True)
