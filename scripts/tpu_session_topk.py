"""Sampler-sort probe: is a candidate-set (partial) top-k materially
cheaper than the full-vocab sort on the v5e? Decides whether the two-stage
exact sampler (candidates + cond fallback) is worth building.

In-graph 64-rep scan timing (tunnel discipline); interleaved variants.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

B, V = 8, 128256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, V)).astype(np.float32))


def timeit(name, fn, reps=64):
    @jax.jit
    def loop(x):
        def body(c, s):
            # vary input per step (no CSE hoist) AND thread the result back
            # into the carry (no per-iteration DCE — memory trap)
            y = fn(c + s.astype(jnp.float32) * 1e-9)
            r = y[0] if isinstance(y, tuple) else y
            c = c + jnp.sum(r.astype(jnp.float32)) * jnp.float32(1e-20)
            return c, ()
        c, _ = jax.lax.scan(body, x, jnp.arange(reps, dtype=jnp.int32))
        return c

    out = loop(x)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        o = loop(x)
        jax.block_until_ready(o)
        best = min(best, (time.time() - t0) / reps)
    print(f"{name}: {best*1e6:.0f} us", flush=True)
    return best


timeit("top_k full V", lambda z: jax.lax.top_k(z, V)[0])
timeit("top_k 1024", lambda z: jax.lax.top_k(z, 1024)[0])
timeit("top_k 256", lambda z: jax.lax.top_k(z, 256)[0])
timeit("top_k 64", lambda z: jax.lax.top_k(z, 64)[0])
timeit("approx_max_k 256 (r=1.0)",
       lambda z: jax.lax.approx_max_k(z, 256, recall_target=1.0)[0])
timeit("approx_max_k 256 (r=.99)",
       lambda z: jax.lax.approx_max_k(z, 256, recall_target=0.99)[0])
timeit("logsumexp", lambda z: jax.scipy.special.logsumexp(z, axis=-1))
timeit("categorical full V",
       lambda z: jax.random.categorical(
           jax.random.PRNGKey(0), z, axis=-1).astype(jnp.float32))
timeit("argmax", lambda z: jnp.argmax(z, axis=-1).astype(jnp.float32))
print("TOPK_DONE", flush=True)
