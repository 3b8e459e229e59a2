"""On-chip validation: desc_act (g_idx) modules run the rt Pallas kernel and
match the XLA g_idx oracle (VERDICT r2 item 3). Llama-3.2-1B-shaped module
(2048x2048 / 2048x8192, g128, act-order) + decode timing."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices(), flush=True)
from gptqmodel_tpu.ops import registry
from gptqmodel_tpu.ops.qlinear import make_quant_linear, qlinear_forward_xla

rng = np.random.default_rng(0)

def build(in_f, out_f, bits=4, g=128, sym=True):
    G = in_f // g
    codes = rng.integers(0, 2**bits, size=(out_f, in_f), dtype=np.int64)
    scales = rng.uniform(0.005, 0.05, size=(G, out_f)).astype(np.float16)
    zeros = np.full((G, out_f), 8, dtype=np.int64)
    perm = rng.permutation(in_f)
    g_idx = (np.arange(in_f) // g)[np.argsort(perm)].astype(np.int32)
    p = make_quant_linear(Q=codes, scales=scales, zeros=zeros, g_idx=g_idx,
                          bias=None, bits=bits, group_size=g, sym=sym)
    assert p.g_idx is not None
    return p

for (in_f, out_f) in [(2048, 2048), (2048, 8192), (8192, 2048)]:
    p = build(in_f, out_f)
    q = registry.post_init_module(p)
    assert q.act_perm is not None and q.rt_layout, (in_f, out_f)
    assert registry.select_kernel(q) == "pallas"
    x = jnp.asarray(rng.standard_normal((8, in_f)), jnp.bfloat16)
    ref = np.asarray(qlinear_forward_xla(p, x), np.float32)
    got = np.asarray(registry.qlinear_forward(q, x), np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    print(f"shape {in_f}x{out_f}: kernel=pallas rel_err_vs_xla_g_idx={rel:.2e}", flush=True)
    assert rel < 8e-3, rel

# in-graph decode timing: act_perm gather overhead vs contiguous module
p_c = build(2048, 8192)
p_c = make_quant_linear(Q=rng.integers(0, 16, size=(8192, 2048), dtype=np.int64),
                        scales=rng.uniform(0.005, 0.05, size=(16, 8192)).astype(np.float16),
                        zeros=np.full((16, 8192), 8, dtype=np.int64), g_idx=None,
                        bias=None, bits=4, group_size=128, sym=True)
q_c = registry.post_init_module(p_c)
p_d = build(2048, 8192)
q_d = registry.post_init_module(p_d)

def timed(q, tag):
    x = jnp.asarray(rng.standard_normal((8, 2048)), jnp.bfloat16)
    @jax.jit
    def loop(x):
        def body(c, _):
            y = registry.qlinear_forward(q, c)
            return (y[:, :2048] * 1e-3).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, x, None, length=200)
        return c
    loop(x).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        loop(x).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / 200)
    print(f"{tag}: {best*1e6:.1f} us/call", flush=True)
    return best

tc = timed(q_c, "contiguous 2048x8192")
td = timed(q_d, "desc_act   2048x8192")
print(f"act_perm overhead: {100*(td/tc-1):.1f}%", flush=True)
print("VERIFY_DESC_ACT_OK", flush=True)
