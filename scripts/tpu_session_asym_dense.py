"""Session ASYM-DENSE (round 4): dense 2/4/8-bit asym rt kernel with bf16 operands
(_qmm_rtp_kernel) on chip — parity vs the XLA oracle + packed-GB/s rate
at llama-8B decode shapes, same methodology as session Z14 part (a)."""
import functools, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

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
    # parity first
    y_pl = qlinear_forward(p, x0)
    y_x = qlinear_forward_xla(p, x0.astype(jnp.float32))
    rel = float(jnp.linalg.norm((y_pl.astype(jnp.float32) - y_x)) /
                jnp.linalg.norm(y_x))
    def loop_n(n, x0, qw, qz, sc, zv):
        import dataclasses
        pp = dataclasses.replace(p, qweight=qw, qzeros=qz, scales=sc, zvals=zv)
        def body(c, _):
            y = qlinear_forward(pp, c)
            return (c * jnp.bfloat16(0.999)
                    + y[:, :1].astype(jnp.bfloat16) * 1e-6), ()
        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c
    args = (x0, p.qweight, p.qzeros, p.scales, p.zvals)
    sfn = jax.jit(functools.partial(loop_n, short))
    lfn = jax.jit(functools.partial(loop_n, short + reps))
    sfn(*args).block_until_ready(); lfn(*args).block_until_ready()
    ts, tl = [], []
    for _ in range(5):
        t0 = time.perf_counter(); sfn(*args).block_until_ready()
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); lfn(*args).block_until_ready()
        tl.append(time.perf_counter() - t0)
    us = (min(tl) - min(ts)) / reps * 1e6
    gbs = (K * N * p.bits / 8) / (us * 1e-6) / 1e9
    print(f"{tag}: rel={rel:.1e} {us:.1f} us = {gbs:.0f} GB/s packed "
          f"(wall-equiv {K*N*p.bits/8/700e9*1e6:.1f} us)", flush=True)

for bits in (2, 4, 8):
    p = build(bits, sym=False)
    assert p.rt_layout and p.zero_const < 0, (bits, p.rt_layout, p.zero_const)
    timed_fwd(p, f"{bits}-bit ASYM rt kernel")
print("SESSION_ASYM_DENSE_DONE", flush=True)
