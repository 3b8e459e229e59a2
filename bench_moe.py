"""MoE decode benchmark: Qwen3-30B-A3B-shaped GPTQ-4bit, single chip.

BASELINE stage 4 (per-expert quant, >=100-expert MoE). Prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"} where vs_baseline is the fraction
of the MoE INT4 roofline achieved.

MoE decode roofline differs from dense: only ROUTED experts stream per step.
With B tokens x top-k uniform routing over E experts the expected unique
expert count is E*(1-(1-1/E)^(B*k)) — for B=8, k=8, E=128 that is 50.6,
matching the 52 measured on random draws (scripts/bench_qmoe_tpu.py). Step
bytes = attention + router + expected routed experts + lm_head, all packed.

Weights are synthetic zeros built on device (zero-egress env; decode
throughput is value-independent). Layers default to 32 of 48 so the model
fits one 16 GB chip next to KV + workspace; roofline uses the same count.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


HBM_GBPS = 819.0
WALL_GBPS = 700.0  # measured consume-everything rate (STATUS round-2)


def qwen3_30b_spec(layers: int):
    from gptqmodel_tpu.models.spec import ModelSpec

    # Qwen/Qwen3-30B-A3B config.json shapes (48 layers full model)
    return ModelSpec(
        model_type="qwen3_moe",
        vocab_size=151936,
        hidden_size=2048,
        intermediate_size=6144,  # unused: all layers sparse
        num_layers=layers,
        num_heads=32,
        num_kv_heads=4,
        head_dim=128,
        rope_theta=1_000_000.0,
        max_position_embeddings=40960,
        num_experts=128,
        num_experts_per_tok=8,
        moe_intermediate_size=768,
        norm_topk_prob=True,
    )


def build_params(spec, bits=4, g=128):
    import jax.numpy as jnp

    from gptqmodel_tpu.ops.pallas_qmoe import StackedQuantExperts
    from gptqmodel_tpu.ops.pallas_qmatmul import rt_block_k_for, rt_supported
    from gptqmodel_tpu.ops.qlinear import QuantLinear

    pf = 32 // bits
    E = spec.num_experts
    D = spec.hidden_size
    F = spec.moe_intermediate_size

    import jax

    # RANDOM codes (not zeros): with zero codes every dequantized weight is
    # the same constant, hidden states stay exactly zero, router logits tie,
    # and top-k degenerates to experts 0..k — the roofline's expected-unique-
    # experts model would then grade a ~9-expert workload. Random codes +
    # random embeddings give genuinely spread routing; the probe below
    # MEASURES the spread and the roofline uses the measured value.
    _keys = iter(jax.random.split(jax.random.PRNGKey(0), 4096))

    scale = float(os.environ.get("BENCH_MOE_SCALE", "0.01"))

    # Routing spread (round-4 fix, VERDICT r3 "weak #1"): ANY deep net with
    # iid random weights collapses cross-row hidden diversity to a rank-one
    # attractor (measured: cross-row |cos| -> 1.0 by layer ~4 even at 30x
    # smaller weight scale, scripts/routing_collapse_diag.py) — all rows
    # then route to ~2 antipodal expert sets = the unrepresentative 13.2
    # unique experts r3 recorded. Trained models don't do this; synthetic
    # ones can't avoid it by tuning gain. The surgical fix: give o_proj and
    # down_proj codes == zero_const, i.e. EXACTLY ZERO dequantized weights.
    # The residual stream then stays the per-token embedding at every
    # depth, so the per-layer random routers route near-iid (~50 unique of
    # 128 at B=8 top-8 — the real Qwen3-30B serving regime), while the
    # streamed bytes / kernel launches / MXU work are bit-for-bit the same
    # programs (codes are runtime args; XLA cannot fold them). The serial
    # decode dependency survives: logits = lm_head(norm(embed[token])).
    # BENCH_MOE_DIVERSE=0 reverts to the r3 all-random model (the
    # concentrated-routing secondary row).
    diverse = os.environ.get("BENCH_MOE_DIVERSE", "1") == "1"

    def _const_words(shape, code=8):
        word = sum(code << (4 * j) for j in range(8))  # 4-bit fields
        return jnp.full(shape, np.int32(np.uint32(word).view(np.int32)),
                        jnp.int32)

    _zero_words = _const_words

    def _rand_words(shape):
        return jax.lax.bitcast_convert_type(
            jax.random.bits(next(_keys), shape, dtype=jnp.uint32), jnp.int32
        )

    def ql(out_f, in_f, zero_w=False):
        G = in_f // g
        rt = rt_supported(bits, g, in_f)
        words = _zero_words if (zero_w and bits == 4) else _rand_words
        # qzeros/zvals must encode the SYM zero point 8, not 0: the Pallas
        # sym kernels dequant (code - zero_const) but the XLA reference path
        # dequants (code - qzeros); zero qzeros biased every XLA-path weight
        # by +8*scale — a shared all-ones rank-one component that alone
        # collapses routing (scripts/routing_collapse_diag.py)
        return QuantLinear(
            qweight=words((in_f // pf, out_f)),
            qzeros=(_const_words((G, out_f // pf)) if bits == 4
                    else jnp.zeros((G, out_f // pf), jnp.int32)),
            scales=jnp.full((G, out_f), scale, jnp.bfloat16),
            g_idx=None, bias=None,
            zvals=jnp.full((G, out_f), 8.0, jnp.float32),
            bits=bits, group_size=g, in_features=in_f, out_features=out_f,
            sym=True, rt_layout=rt,
            rt_block_k=rt_block_k_for(in_f, g, N=out_f) if rt else 0,
            zero_const=8.0,
        )

    def stacked(K, N, zero_w=False):
        from gptqmodel_tpu.ops.pallas_qmoe import stacked_rt_ok

        G = K // g
        G_pad = max(8, -(-G // 8) * 8)
        words = _zero_words if (zero_w and bits == 4) else _rand_words
        # rt layout where the geometry allows (gate|up at K=2048): random
        # codes are permutation-invariant and constant codes are layout-
        # invariant, so flagging rt without physically permuting is exact
        return StackedQuantExperts(
            qweight=words((E, K // pf, N)),
            scales=jnp.full((E, G_pad, N), scale, jnp.bfloat16),
            bits=bits, G=G, zero_const=8.0, in_features=K, out_features=N,
            rt=stacked_rt_ok(bits, K, g, subgroup=True),
        )

    h = D
    q = spec.num_heads * spec.head_dim
    kv = spec.num_kv_heads * spec.head_dim
    hd = spec.head_dim
    rng = np.random.default_rng(0)
    layers = []
    for _ in range(spec.num_layers):
        layers.append({
            "input_layernorm": {"weight": jnp.ones(h, jnp.bfloat16)},
            "post_attention_layernorm": {"weight": jnp.ones(h, jnp.bfloat16)},
            "self_attn": {
                # fused qkv mirrors what optimize.fuse_projections produces
                # for real loaded models; BENCH_MOE_FUSED_QKV=0 reverts
                **({"qkv_proj": ql(q + 2 * kv, h)}
                   if os.environ.get("BENCH_MOE_FUSED_QKV", "1") == "1"
                   else {"q_proj": ql(q, h), "k_proj": ql(kv, h),
                         "v_proj": ql(kv, h)}),
                "o_proj": ql(h, q, zero_w=diverse),
                "q_norm": {"weight": jnp.ones(hd, jnp.bfloat16)},
                "k_norm": {"weight": jnp.ones(hd, jnp.bfloat16)},
            },
            "mlp": {
                # random router so top-8 routing is realistic-uniform
                "gate": {"weight": jnp.asarray(
                    rng.standard_normal((spec.num_experts, h)).astype(np.float32)
                    * 0.05, jnp.bfloat16)},
                # fused gate|up by default (what optimize() produces);
                # BENCH_MOE_FUSED=0 reverts to split projections
                "experts_stacked_q": (
                    {"gateup": stacked(D, 2 * F),
                     "down": stacked(F, D, zero_w=diverse)}
                    if os.environ.get("BENCH_MOE_FUSED", "1") == "1"
                    else {"gate": stacked(D, F), "up": stacked(D, F),
                          "down": stacked(F, D, zero_w=diverse)}
                ),
            },
        })
    return {
        "model": {
            "embed_tokens": {"weight": (
                jax.random.normal(next(_keys), (spec.vocab_size, h),
                                  jnp.bfloat16)
            )},
            "layers": layers,
            "norm": {"weight": jnp.ones(h, jnp.bfloat16)},
        },
        "lm_head": ql(spec.vocab_size, h),
    }


def step_bytes(spec, B, bits=4, g=128, uniq=None) -> int:
    """Expected HBM bytes per decode step (routed-experts MoE roofline).
    ``uniq``: unique routed experts per layer per step — pass the MEASURED
    value from the bench's routing probe; defaults to the iid model."""
    h = spec.hidden_size
    q = spec.num_heads * spec.head_dim
    kv = spec.num_kv_heads * spec.head_dim
    E, k = spec.num_experts, spec.num_experts_per_tok
    F = spec.moe_intermediate_size

    def packed(n_params):
        return n_params * bits // 8 + n_params // g * 2  # codes + bf16 scales

    attn = packed(h * q + 2 * h * kv + q * h)
    router = E * h * 2  # bf16
    if uniq is None:
        uniq = E * (1.0 - (1.0 - 1.0 / E) ** (B * k))
    experts = uniq * packed(3 * h * F)
    head = packed(spec.vocab_size * h)
    return int(spec.num_layers * (attn + router + experts) + head)


def main():
    import jax

    if os.environ.get("BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu", "gpu")
    _log(f"backend={backend} devices={jax.devices()}")

    from gptqmodel_tpu.inference.engine import (
        init_kv_cache, make_decode_fn, make_prefill_fn,
    )

    if on_tpu:
        layers = int(os.environ.get("BENCH_MOE_LAYERS", "32"))
        B, T, steps, max_len = 8, 64, 64, 192
        B = int(os.environ.get("BENCH_MOE_BATCH", B))
    else:
        layers, B, T, steps, max_len = 2, 2, 8, 4, 32
        from gptqmodel_tpu.ops import registry

        registry.set_backend("pallas_interpret")  # CPU: interpret the kernels
    spec = qwen3_30b_spec(layers)

    t0 = time.time()
    params = build_params(spec)
    _log(f"params built in {time.time()-t0:.1f}s "
         f"({step_bytes(spec, B)/1e9:.2f} GB expected per step)")

    prefill = make_prefill_fn(spec, jnp.bfloat16)
    decode = make_decode_fn(spec, jnp.bfloat16)
    caches = init_kv_cache(spec, B, max_len, jnp.bfloat16, kv_quant="int8")

    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(1, spec.vocab_size, size=(B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)

    # ---- routing-spread probe: MEASURE unique routed experts per layer per
    # step (eager forward records concrete top_i via a dispatch wrapper) and
    # feed the measured value into the roofline instead of the iid formula
    from gptqmodel_tpu.models import transformer as _tr

    probe_T = 8
    recorded = []
    orig_dispatch = _tr._moe_stacked_dispatch

    def _recording_dispatch(spec_, mp_, x_, top_w_, top_i_):
        recorded.append(np.asarray(top_i_).reshape(B, probe_T, -1))
        return orig_dispatch(spec_, mp_, x_, top_w_, top_i_)

    _tr._moe_stacked_dispatch = _recording_dispatch
    try:
        from gptqmodel_tpu.models.transformer import forward_logits

        t0 = time.time()
        forward_logits(
            spec, params,
            jnp.asarray(rng.integers(1, spec.vocab_size, size=(B, probe_T)),
                        jnp.int32),
            dtype=jnp.bfloat16,
        )
    finally:
        _tr._moe_stacked_dispatch = orig_dispatch
    # deeper positions approximate decode-state routing; the timed loop
    # teacher-forces the SAME per-element random token distribution
    per_step_unique = [
        len(np.unique(ti[:, t])) for ti in recorded
        for t in range(probe_T // 2, probe_T)
    ]
    uniq_measured = float(np.mean(per_step_unique)) if per_step_unique else 0.0
    _log(f"routing probe: mean unique experts/layer/step = "
         f"{uniq_measured:.1f} of {spec.num_experts} "
         f"(iid model: {spec.num_experts * (1 - (1 - 1/spec.num_experts) ** (B * spec.num_experts_per_tok)):.1f}; "
         f"probe {time.time()-t0:.0f}s)")
    t0 = time.time()
    logits, caches, key_valid = prefill(params, ids, lens, caches)
    logits.block_until_ready()
    _log(f"prefill compiled+ran in {time.time()-t0:.1f}s")
    if on_tpu:  # timed prefill (min of 5): e2e kernel serves M>1024 too
        pts = []
        for _ in range(5):
            t0 = time.time()
            prefill(params, ids, lens, caches)[0].block_until_ready()
            pts.append(time.time() - t0)
        pt = min(pts)
        _log(f"prefill: {pt*1e3:.1f} ms for {B}x{T} tokens "
             f"({B*T/pt:.0f} tok/s)")

    token = jnp.argmax(logits, axis=-1)
    pos = lens

    # teacher-forced DISTINCT random tokens per element per step: argmax
    # feedback on a random-weight model collapses the batch onto one
    # stream (all elements pick the same token -> identical hidden states
    # -> degenerate routing far below real serving traffic). Real decode
    # serves B independent sequences; random per-element tokens model
    # that, and the probe above GRADES whatever routing actually results.
    max_steps = 2 + 64
    forced = jnp.asarray(
        rng.integers(1, spec.vocab_size, size=(max_steps, B)), jnp.int32)

    def make_loop(n):
        @jax.jit
        def loop(params, token, pos, key_valid, caches):
            def body(carry, s):
                token, pos, key_valid, caches = carry
                logits, caches, key_valid = decode(
                    params, token, pos, T + s, key_valid, caches)
                # diverse AND serialized: mixing argmax into the forced
                # token keeps per-element diversity (pure argmax feedback
                # collapses the batch) while keeping the real decode data
                # dependency — pure teacher forcing lets XLA overlap
                # consecutive steps, under-reading serving latency
                token = (
                    forced[s] + jnp.argmax(logits, axis=-1).astype(jnp.int32)
                ) % (spec.vocab_size - 1) + 1
                return (token, pos + 1, key_valid, caches), logits[0, 0]
            (token, pos, key_valid, caches), xs = jax.lax.scan(
                body, (token, pos, key_valid, caches), jnp.arange(n))
            return xs.sum()
        return loop

    warm, timed = make_loop(2), make_loop(2 + steps)
    t0 = time.time()
    float(warm(params, token, pos, key_valid, caches))
    float(timed(params, token, pos, key_valid, caches))
    _log(f"decode loops compiled+warm in {time.time()-t0:.1f}s")

    # min-min differential (see bench.py): min each side separately
    t_warms, t_timeds = [], []
    for _ in range(5):
        t0 = time.time()
        float(warm(params, token, pos, key_valid, caches))
        t_warms.append(time.time() - t0)
        t0 = time.time()
        float(timed(params, token, pos, key_valid, caches))
        t_timeds.append(time.time() - t0)
    step_time = (min(t_timeds) - min(t_warms)) / steps
    toks_per_s = B / step_time

    sb = step_bytes(spec, B, uniq=uniq_measured or None)
    roof = HBM_GBPS * 1e9 / sb
    vs = (1.0 / step_time) / roof
    vs_wall = (1.0 / step_time) / (WALL_GBPS * 1e9 / sb)
    _log(
        f"MoE decode: {step_time*1e3:.2f} ms/step, {toks_per_s:.1f} tok/s "
        f"(B={B}, {layers}L) -> {vs*100:.1f}% of nameplate MoE roofline "
        f"({vs_wall*100:.1f}% of the {WALL_GBPS:.0f} GB/s wall)"
    )
    print(json.dumps({
        "metric": f"qwen3-30B-A3B-gptq4 MoE decode tok/s/chip (B={B}, {layers}L)"
        if on_tpu else "tiny-moe decode tok/s (cpu sanity)",
        "value": round(toks_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(vs, 4),
        "vs_measured_wall": round(vs_wall, 4),
        "unique_experts_measured": round(uniq_measured, 1),
    }))


if __name__ == "__main__":
    main()
