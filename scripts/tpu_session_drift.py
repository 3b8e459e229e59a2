"""Attribute the r02->r03 dense-decode drift (-1.2%, VERDICT r4 #7).

Inter-process chip drift is +-5%, so the only trustworthy A/B is inside ONE
process: the round-2 tree's package (commit b258c45, the tree BENCH_r02 ran)
is copied to a renamed module ``gptqmodel_tpu_r02`` and both versions build
identical synthetic llama-8B params and run the SAME min-min 64-step
differential, interleaved, current tree last.
"""
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
R02_SRC = REPO / ".wt_r02" / "gptqmodel_tpu"
R02_DST = Path("/tmp/r02pkg/gptqmodel_tpu_r02")


def prepare_r02():
    if R02_DST.exists():
        shutil.rmtree(R02_DST)
    R02_DST.parent.mkdir(parents=True, exist_ok=True)
    shutil.copytree(R02_SRC, R02_DST)
    for p in R02_DST.rglob("*.py"):
        s = p.read_text()
        p.write_text(s.replace("gptqmodel_tpu", "gptqmodel_tpu_r02"))


prepare_r02()
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(R02_DST.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

B, T, steps, max_len, layers = 8, 128, 64, 256, 32


def build_version(tag):
    """(params, warm_loop, timed_loop, state) for one package version."""
    if tag == "r02":
        from gptqmodel_tpu_r02.inference.engine import (
            init_kv_cache, make_decode_fn, make_prefill_fn)
        from gptqmodel_tpu_r02.utils.testing import llama8b_spec
        import gptqmodel_tpu_r02  # noqa
        sys.modules["_bench_pkg"] = __import__("gptqmodel_tpu_r02")
        from gptqmodel_tpu_r02.ops.pallas_qmatmul import (
            rt_block_k_for, rt_supported)
        from gptqmodel_tpu_r02.ops.qlinear import QuantLinear
    else:
        from gptqmodel_tpu.inference.engine import (
            init_kv_cache, make_decode_fn, make_prefill_fn)
        from gptqmodel_tpu.utils.testing import llama8b_spec
        from gptqmodel_tpu.ops.pallas_qmatmul import (
            rt_block_k_for, rt_supported)
        from gptqmodel_tpu.ops.qlinear import QuantLinear

    spec = llama8b_spec(layers=layers)
    bits, g = 4, 128
    pf = 32 // bits

    def ql(out_f, in_f):
        G = in_f // g
        rt = rt_supported(bits, g, in_f)
        return QuantLinear(
            qweight=jnp.zeros((in_f // pf, out_f), jnp.int32),
            qzeros=jnp.zeros((G, out_f // pf), jnp.int32),
            scales=jnp.full((G, out_f), 0.01, jnp.bfloat16),
            g_idx=None, bias=None,
            zvals=jnp.zeros((G, out_f), jnp.float32),
            bits=bits, group_size=g, in_features=in_f, out_features=out_f,
            sym=True, rt_layout=rt,
            rt_block_k=rt_block_k_for(in_f, g, N=out_f) if rt else 0,
            zero_const=0.0,
        )

    h, q = spec.hidden_size, spec.num_heads * spec.head_dim
    kv = spec.num_kv_heads * spec.head_dim
    lyr = lambda: {
        "input_layernorm": {"weight": jnp.ones(h, jnp.bfloat16)},
        "post_attention_layernorm": {"weight": jnp.ones(h, jnp.bfloat16)},
        "self_attn": {"q_proj": ql(q, h), "k_proj": ql(kv, h),
                      "v_proj": ql(kv, h), "o_proj": ql(h, q)},
        "mlp": {"gate_proj": ql(spec.intermediate_size, h),
                "up_proj": ql(spec.intermediate_size, h),
                "down_proj": ql(h, spec.intermediate_size)},
    }
    params = {
        "model": {
            "embed_tokens": {"weight": jnp.zeros((spec.vocab_size, h),
                                                 jnp.bfloat16)},
            "layers": [lyr() for _ in range(spec.num_layers)],
            "norm": {"weight": jnp.ones(h, jnp.bfloat16)},
        },
        "lm_head": ql(spec.vocab_size, h),
    }

    prefill = make_prefill_fn(spec, jnp.bfloat16)
    decode = make_decode_fn(spec, jnp.bfloat16)
    caches = init_kv_cache(spec, B, max_len, jnp.bfloat16, kv_quant="int8")
    ids = jnp.asarray(np.ones((B, T), np.int32))
    lens = jnp.full((B,), T, jnp.int32)
    logits, caches, key_valid = prefill(params, ids, lens, caches)
    logits.block_until_ready()
    token = jnp.argmax(logits, axis=-1)
    pos = lens

    def make_loop(n):
        @jax.jit
        def loop(params, token, pos, key_valid, caches):
            def body(carry, s):
                token, pos, key_valid, caches = carry
                logits, caches, key_valid = decode(
                    params, token, pos, T + s, key_valid, caches)
                token = jnp.argmax(logits, axis=-1)
                return (token, pos + 1, key_valid, caches), token[0]
            carry, toks = jax.lax.scan(
                body, (token, pos, key_valid, caches), jnp.arange(n))
            return toks.sum()
        return loop

    state = (params, token, pos, key_valid, caches)
    return make_loop(2), make_loop(2 + steps), state


print("building r02 version...", flush=True)
t0 = time.time()
w02, t02, s02 = build_version("r02")
float(w02(*s02)); float(t02(*s02))
print(f"r02 compiled+warm in {time.time()-t0:.0f}s", flush=True)

print("building current version...", flush=True)
t0 = time.time()
wcur, tcur, scur = build_version("cur")
float(wcur(*scur)); float(tcur(*scur))
print(f"current compiled+warm in {time.time()-t0:.0f}s", flush=True)

reps = {"r02": ([], []), "cur": ([], [])}
for i in range(7):
    for tag, (w, t, s) in (("r02", (w02, t02, s02)),
                           ("cur", (wcur, tcur, scur))):
        t0 = time.time(); float(w(*s)); reps[tag][0].append(time.time() - t0)
        t0 = time.time(); float(t(*s)); reps[tag][1].append(time.time() - t0)

for tag in ("r02", "cur"):
    tw, tt = reps[tag]
    ms = (min(tt) - min(tw)) / steps * 1e3
    print(f"{tag}: {ms:.3f} ms/step ({B / (ms / 1e3):.1f} tok/s) "
          f"warm_min={min(tw):.3f}s timed_min={min(tt):.3f}s", flush=True)
