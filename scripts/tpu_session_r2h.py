"""TPU session H: fused quantized-MLP kernel (ops/pallas_qmlp) on-chip.

1. Correctness at llama-8B MLP shapes (D=4096, F=14336) vs the sym-kernel
   per-projection pair, real random codes.
2. Micro timing: fused kernel vs (gate_up matmul + silu·mul + down matmul).
   Ideal weight-stream: 3·D·F/2 bytes = 88.1 MB -> ~114 us at 774 GB/s.
3. Full llama-8B decode A/B at B=8 int8 KV: per-projection baseline
   (~5.77 ms/step prior) vs fused-MLP decode.
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

import dataclasses

from gptqmodel_tpu.ops import registry
from gptqmodel_tpu.ops.pallas_qmatmul import qmatmul
from gptqmodel_tpu.ops.pallas_qmlp import qmlp
from gptqmodel_tpu.ops.qlinear import make_quant_linear
from gptqmodel_tpu.models.optimize import _concat_quant

D, F, M = 4096, 14336, 8
g = 128

# ---------------------------------------------------------------- build
r = np.random.default_rng(0)


def mk(out_f, in_f):
    codes = r.integers(0, 16, size=(out_f, in_f), dtype=np.int32)
    scales = r.uniform(0.005, 0.02, size=(in_f // g, out_f)).astype(np.float32)
    zeros = np.full((in_f // g, out_f), 8, np.int32)
    return registry.post_init_module(make_quant_linear(
        Q=codes, scales=scales, zeros=zeros, g_idx=None, bias=None,
        bits=4, group_size=g, sym=True, scales_dtype=np.float32,
    ))


gate, up = mk(F, D), mk(F, D)
gu = _concat_quant([gate, up])
down_raw = mk(D, F)
# kernel F-tile contract: down repacked at 8-group tiles
from gptqmodel_tpu.ops.pack import repack_rt, unrepack_rt

bf = 8 * g
down = dataclasses.replace(
    down_raw,
    qweight=jnp.asarray(repack_rt(
        unrepack_rt(np.asarray(down_raw.qweight), 4, down_raw.rt_block_k),
        4, bf,
    )),
    rt_block_k=bf,
)
log(f"modules built gu_bk={gu.rt_block_k} zc={gu.zero_const} "
    f"down_bk={down.rt_block_k} [t+{time.time()-t_start:.0f}s]")

x0 = jnp.asarray(r.standard_normal((M, D)) * 0.3, jnp.bfloat16)


@jax.jit
def pair(x, qw_gu, s_gu, qw_d, s_d):
    y = qmatmul(x, qw_gu, s_gu, s_gu, bits=4, group_size=g, rt=True,
                rt_block_k=gu.rt_block_k, zero_const=gu.zero_const)
    gg, uu = jnp.split(y, 2, axis=-1)
    inner = (jax.nn.silu(gg.astype(jnp.float32)) * uu.astype(jnp.float32)
             ).astype(jnp.bfloat16)
    return qmatmul(inner, qw_d, s_d, s_d, bits=4, group_size=g, rt=True,
                   rt_block_k=down.rt_block_k, zero_const=down.zero_const)


@jax.jit
def fused(x, qw_gu, s_gu, qw_d, s_d):
    return qmlp(x, qw_gu, s_gu, qw_d, s_d, bits=4, group_size=g,
                kt_gu=gu.rt_block_k, zc_gu=gu.zero_const,
                zc_d=down.zero_const, act="silu")


pa = (x0, gu.qweight, gu.scales, down.qweight, down.scales)
y_pair = pair(*pa)
y_fused = fused(*pa)
rel = float(jnp.linalg.norm((y_fused - y_pair).astype(jnp.float32))
            / jnp.linalg.norm(y_pair.astype(jnp.float32)))
log(f"CORRECTNESS fused vs pair rel={rel:.2e} [t+{time.time()-t_start:.0f}s]")

# ---------------------------------------------------------------- micro time


def make_loop(fn, nit):
    @jax.jit
    def loop(x, qw_gu, s_gu, qw_d, s_d):
        def body(c, _):
            y = fn(c, qw_gu, s_gu, qw_d, s_d)
            c = c + y.astype(c.dtype) * jnp.asarray(1e-8, c.dtype)
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=nit)
        return jnp.sum(c.astype(jnp.float32))
    return loop


BYTES = 3 * D * F // 2
for name, fn in [("pair", pair), ("fused", fused)]:
    lo, hi = make_loop(fn, 20), make_loop(fn, 220)
    float(lo(*pa)); float(hi(*pa))
    dts = []
    for _ in range(3):
        t0 = time.time(); float(lo(*pa)); tl = time.time() - t0
        t0 = time.time(); float(hi(*pa)); th = time.time() - t0
        dts.append((th - tl) / 200)
    dt = sorted(dts)[1]
    log(f"TIME mlp-{name} D{D} F{F} M{M}: {dt*1e6:.1f} us, "
        f"{BYTES/dt/1e9:.0f} GB/s packed [t+{time.time()-t_start:.0f}s]")

del gate, up, gu, down, down_raw, pa, y_pair, y_fused
gc.collect()

# ---------------------------------------------------------------- decode A/B
from bench import build_quant_params_on_device, packed_model_bytes
from gptqmodel_tpu.inference.engine import (
    init_kv_cache,
    make_decode_fn,
    make_prefill_fn,
)
from gptqmodel_tpu.models.optimize import enable_fused_mlp, fuse_projections
from gptqmodel_tpu.utils.testing import llama8b_spec

spec = llama8b_spec(layers=32)
B, T, steps, max_len = 8, 128, 32, 256
roof = 819e9 / packed_model_bytes(spec, 4, 128)


def run_decode(params, tag):
    prefill = make_prefill_fn(spec, jnp.bfloat16)
    decode = make_decode_fn(spec, jnp.bfloat16)
    caches = init_kv_cache(spec, B, max_len, jnp.bfloat16, kv_quant="int8")
    ids = jnp.asarray(np.ones((B, T), np.int32))
    lens = jnp.full((B,), T, jnp.int32)
    logits, caches, key_valid = prefill(params, ids, lens, caches)
    logits.block_until_ready()
    token = jnp.argmax(logits, axis=-1)
    pos = lens

    def make_dloop(nsteps):
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

    warm, timed = make_dloop(2), make_dloop(2 + steps)
    args = (params, token, pos, key_valid, caches)
    float(warm(*args)); float(timed(*args))
    best = None
    for _ in range(3):
        t0 = time.time(); float(warm(*args)); t_w = time.time() - t0
        t0 = time.time(); float(timed(*args)); t_t = time.time() - t0
        st = (t_t - t_w) / steps
        best = st if best is None else min(best, st)
    log(f"DECODE {tag}: {best*1e3:.2f} ms/step, {B/best:.0f} tok/s, "
        f"{(1/best)/roof*100:.1f}% roofline [t+{time.time()-t_start:.0f}s]")


params = build_quant_params_on_device(spec, 4, 128)
run_decode(params, "baseline per-proj")

# fused variant: all-zero codes are layout-invariant, so retagging the down
# rt tile to the kernel's 8-group F-tile needs no data movement
for lp in params["model"]["layers"]:
    dp = lp["mlp"]["down_proj"]
    lp["mlp"]["down_proj"] = dataclasses.replace(dp, rt_block_k=8 * 128)
params = fuse_projections(spec, params)
params = enable_fused_mlp(spec, params)
gu0 = params["model"]["layers"][0]["mlp"]["gate_up_proj"]
log(f"fused params: gu zc={gu0.zero_const} "
    f"down_bk={params['model']['layers'][0]['mlp']['down_proj'].rt_block_k}")
run_decode(params, "fused-mlp")

log(f"DONE [t+{time.time()-t_start:.0f}s]")
