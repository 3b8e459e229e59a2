"""Session V3: device-resident timing of the GPTQ solve core (mega vs xla),
the Hessian-inverse split (cholesky vs tri-inv), and fetch costs.

Session V2's gptq_quantize A/B was swamped by host<->device transfers over
the tunnel (W up 470 MB, Q/Wq/losses down ~1.4 GB at gate|up shape); this
isolates device time: inputs created ON device, outputs block_until_ready,
no fetches in the timed region.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

from gptqmodel_tpu.quantization.gptq import (
    _chol_inv_upper, _tri_inv_lower, gptq_solve_core, hessian_inverse,
)

key = jax.random.PRNGKey(0)


def dev_problem(out_f, in_f):
    k1, k2 = jax.random.split(jax.random.fold_in(key, out_f * 131 + in_f))
    W = jax.random.normal(k1, (out_f, in_f), jnp.float32) * 0.02
    X = jax.random.normal(k2, (2048, in_f), jnp.float32)
    H = (2.0 / 2048) * jnp.matmul(X.T, X, precision="highest")
    return W, H


def t(fn, *a, reps=2, **kw):
    best = None
    for _ in range(reps):
        t0 = time.time()
        r = fn(*a, **kw)
        jax.block_until_ready(r)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, r


# ---- hessian inverse split at 14336 and 4096 ----
for n in (4096, 14336):
    _, H = dev_problem(256, n)
    idx = jnp.arange(n)
    Hd = H.at[idx, idx].add(0.01 * jnp.mean(jnp.diag(H)))
    chol = jax.jit(lambda A: jnp.linalg.cholesky(A[::-1, ::-1]))
    dt, L = t(chol, Hd)
    print(f"cholesky({n}) warm-min: {dt:.2f}s", flush=True)
    tri = jax.jit(_tri_inv_lower)
    dt, _ = t(tri, L)
    print(f"tri_inv({n}) warm-min: {dt:.2f}s", flush=True)
    dt, _ = t(lambda A: _chol_inv_upper(A, jnp.float32(0.01)), H)
    print(f"chol_inv_upper({n}) warm-min: {dt:.2f}s", flush=True)

# ---- solve core device time, mega vs xla ----
for (out_f, in_f) in ((28672, 4096), (6144, 4096), (4096, 4096), (4096, 14336)):
    W, H = dev_problem(out_f, in_f)
    U, _ = hessian_inverse(H, 0.01)
    for mode in ("mega", "pallas", ""):
        name = mode or "xla"
        try:
            dt, res = t(
                gptq_solve_core, W, U,
                bits=4, group_size=128, sym=True, solver=mode,
            )
            print(f"solve {out_f}x{in_f} {name}: {dt:.2f}s "
                  f"loss={float(jnp.sum(res['losses'])):.4f}", flush=True)
        except Exception as e:  # mega falls back inside; pallas may not fit
            print(f"solve {out_f}x{in_f} {name}: FAILED {type(e).__name__} {e}",
                  flush=True)

# ---- fetch cost: Q int32 vs uint8 at gate|up shape ----
W, H = dev_problem(28672, 4096)
U, _ = hessian_inverse(H, 0.01)
res = gptq_solve_core(W, U, bits=4, group_size=128, sym=True, solver="mega")
Q = res["Q"]
jax.block_until_ready(Q)
t0 = time.time(); q32 = np.asarray(Q); print(f"fetch Q int32: {time.time()-t0:.2f}s", flush=True)
q8d = Q.astype(jnp.uint8); jax.block_until_ready(q8d)
t0 = time.time(); q8 = np.asarray(q8d); print(f"fetch Q uint8: {time.time()-t0:.2f}s", flush=True)
wq = res["Wq"]; jax.block_until_ready(wq)
t0 = time.time(); _ = np.asarray(wq); print(f"fetch Wq f32: {time.time()-t0:.2f}s", flush=True)
print("DONE", flush=True)
