"""Session Z3 (round 3): end-to-end MoE layer kernel on chip.

The e2e kernel folds the one-hot gather, expert MLP and weighted combine
into the dynamic-trip slot loop (no [S*bm, D] HBM slot buffers, no empty
slots). Here: Mosaic parity vs the composed path (slot kernel +
gather/weight/scatter in XLA), then min-of-3 in-graph timing of the WHOLE
post-routing layer (both formulations include their dispatch glue) at the
honest 13-expert plan and an iid-like 50-expert plan.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from gptqmodel_tpu.ops.pallas_qmoe import (
    StackedQuantExperts, build_slots, fuse_gate_up,
    qmoe_mlp_forward_sorted, qmoe_mlp_forward_e2e,
)

rng = np.random.default_rng(0)
bits, g = 4, 128
E, D, F = 128, 2048, 768
tokens, topk, bm = 8, 8, 8
M = tokens * topk
S_full = M // bm + min(E, M)  # 72


def stack(K, N):
    G = K // g
    G_pad = max(8, -(-G // 8) * 8)
    kq = jax.random.PRNGKey(K * 7 + N)
    sc = np.zeros((E, G_pad, N), np.float32)
    sc[:, :G] = 0.01
    return StackedQuantExperts(
        qweight=jax.lax.bitcast_convert_type(
            jax.random.bits(kq, (E, K // (32 // bits), N), dtype=jnp.uint32),
            jnp.int32),
        scales=jnp.asarray(sc, jnp.bfloat16),
        bits=bits, G=G, zero_const=8.0, in_features=K, out_features=N,
    )


gu = fuse_gate_up(stack(D, F), stack(D, F))
down = stack(F, D)


def make_plan(uniq):
    routed = rng.choice(E, size=uniq, replace=False)
    top_i = rng.choice(routed, size=(tokens, topk))
    top_w = rng.uniform(0.1, 1.0, (tokens, topk)).astype(np.float32)
    pos, ids, counts, order = build_slots(top_i, E, bm, S_full)
    tok = order // topk
    w_sorted = top_w.reshape(-1)[order]
    x = (rng.standard_normal((tokens, D)) * 0.5).astype(np.float32)
    used = int((counts > 0).sum())
    return (jnp.asarray(x, jnp.bfloat16), jnp.asarray(pos), jnp.asarray(tok),
            jnp.asarray(w_sorted), jnp.asarray(ids), jnp.asarray(counts),
            used)


def composed(x, pos, tok, w_sorted, ids, counts, gu, down):
    """Old path: scatter to slots, slot kernel (grid), gather+weight+add."""
    M_pad = S_full * bm
    xs = jnp.zeros((M_pad, D), jnp.bfloat16).at[pos].set(
        x.astype(jnp.bfloat16)[tok])
    y = qmoe_mlp_forward_sorted(xs, ids, counts, gu, down, act="silu",
                                bm=bm, out_dtype=jnp.bfloat16, dyn=False)
    return jnp.zeros((tokens, D), jnp.float32).at[tok].add(
        y[pos].astype(jnp.float32) * w_sorted[:, None])


def e2e(x, pos, tok, w_sorted, ids, counts, gu, down):
    return qmoe_mlp_forward_e2e(x, pos, tok, w_sorted, ids, counts, gu,
                                down, act="silu", bm=bm)


# --- Mosaic parity ---
plan13 = make_plan(13)
x, pos, tok, w_s, ids, counts, used13 = plan13
ref = np.asarray(composed(x, pos, tok, w_s, ids, counts, gu, down))
out = np.asarray(e2e(x, pos, tok, w_s, ids, counts, gu, down))
d = np.abs(ref - out)
rel = d.max() / (np.abs(ref).max() + 1e-9)
print(f"Mosaic parity (13-expert, used={used13}): max abs {d.max():.3e} "
      f"rel {rel:.3e}", flush=True)
# composed rounds y to bf16 before combine; e2e combines in f32 — bf16-level
assert rel < 2e-2, "e2e mismatch on chip"


def timed_layers(fn, w, x0, aux, tag, reps=50):
    """In-graph scan, min-of-3 differential; weights are jit ARGUMENTS."""
    import functools

    pos, tok, w_s, ids, counts = aux

    def loop_n(n, x0, w):
        def body(c, _):
            y = fn(c, pos, tok, w_s, ids, counts, w[0], w[1])
            return (y * 1e-3 + x0 * 1e-6).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, x0.astype(jnp.bfloat16), None, length=n)
        return c

    short = jax.jit(functools.partial(loop_n, 5))
    long = jax.jit(functools.partial(loop_n, 5 + reps))
    short(x0, w).block_until_ready()
    long(x0, w).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); short(x0, w).block_until_ready()
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); long(x0, w).block_until_ready()
        tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / reps)
    print(f"{tag}: {best*1e6:.1f} us/call", flush=True)
    return best


pk = 3 * D * F * bits // 8 + 3 * D * F // g * 2
for uniq in (13, 50):
    x, pos, tok, w_s, ids, counts, used = make_plan(uniq)
    aux = (pos, tok, w_s, ids, counts)
    print(f"--- plan: {uniq} experts, {used} used slots of {S_full} "
          f"(floor {uniq*pk/700e9*1e6:.1f} us)", flush=True)
    timed_layers(e2e, (gu, down), x, aux, f"e2e      u{uniq}")
    timed_layers(composed, (gu, down), x, aux, f"composed u{uniq}")

print("SESSION_Z3_DONE", flush=True)
