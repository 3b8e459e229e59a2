"""Fused decode-attention kernel vs the XLA attention path.

The XLA path is the executable reference semantics (CLAUDE.md rule); the
Pallas kernel (interpret mode on CPU) must match it on the same cache
state, for bf16 and int8 KV caches, GQA and MHA.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gptqmodel_tpu.inference.engine import init_kv_cache, make_decode_fn, make_prefill_fn
from gptqmodel_tpu.ops.registry import set_attention_backend
from gptqmodel_tpu.utils.testing import tiny_spec


def _random_dense_params(spec, seed=0):
    rng = np.random.default_rng(seed)

    def lin(out_f, in_f):
        return {"weight": jnp.asarray(
            rng.standard_normal((out_f, in_f)).astype(np.float32) * 0.05
        )}

    h = spec.hidden_size
    q = spec.num_heads * spec.head_dim
    kv = spec.num_kv_heads * spec.head_dim
    layers = []
    for _ in range(spec.num_layers):
        layers.append({
            "input_layernorm": {"weight": jnp.ones(h, jnp.float32)},
            "post_attention_layernorm": {"weight": jnp.ones(h, jnp.float32)},
            "self_attn": {
                "q_proj": lin(q, h), "k_proj": lin(kv, h),
                "v_proj": lin(kv, h), "o_proj": lin(h, q),
            },
            "mlp": {
                "gate_proj": lin(spec.intermediate_size, h),
                "up_proj": lin(spec.intermediate_size, h),
                "down_proj": lin(h, spec.intermediate_size),
            },
        })
    emb = rng.standard_normal((spec.vocab_size, h)).astype(np.float32) * 0.05
    return {
        "model": {
            "embed_tokens": {"weight": jnp.asarray(emb)},
            "layers": layers,
            "norm": {"weight": jnp.ones(h, jnp.float32)},
        },
        "lm_head": lin(spec.vocab_size, h),
    }


@pytest.mark.parametrize("kv_heads,kv_quant", [(4, False), (2, False), (2, True)])
def test_fused_decode_attention_matches_xla(kv_heads, kv_quant):
    # head_dim must be 128-lane aligned for the kernel: hidden 512 / 4 heads
    spec = tiny_spec(hidden=512, layers=2, heads=4, kv_heads=kv_heads,
                     inter=256, vocab=256)
    assert spec.head_dim == 128
    params = _random_dense_params(spec)
    B, T, max_len = 2, 8, 16
    ids = jnp.asarray(np.arange(B * T).reshape(B, T) % spec.vocab_size)
    lens = jnp.full((B,), T, jnp.int32)

    prefill = make_prefill_fn(spec, jnp.float32)
    decode = make_decode_fn(spec, jnp.float32)

    def run(backend):
        set_attention_backend(backend)
        caches = init_kv_cache(spec, B, max_len, jnp.float32, kv_quant=kv_quant)
        logits, caches, kvd = prefill(params, ids, lens, caches)
        tok = jnp.argmax(logits, -1)
        outs = []
        for s in range(3):
            logits, caches, kvd = decode(
                params, tok, lens + s, jnp.int32(T + s), kvd, caches
            )
            tok = jnp.argmax(logits, -1)
            outs.append(np.asarray(logits))
        return outs

    try:
        xla = run("xla")
        fused = run("pallas_interpret")
    finally:
        set_attention_backend("auto")
    for a, b in zip(xla, fused):
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)


def test_fused_decode_respects_mask():
    """Ragged batch: different prompt lengths -> pad slots must not leak."""
    spec = tiny_spec(hidden=256, layers=1, heads=2, kv_heads=2,
                     inter=128, vocab=64)
    assert spec.head_dim == 128
    params = _random_dense_params(spec, seed=1)
    B, T, max_len = 2, 6, 12
    ids = np.arange(B * T).reshape(B, T) % spec.vocab_size
    ids[1, 4:] = 0  # padded
    lens = jnp.asarray([6, 4], jnp.int32)

    prefill = make_prefill_fn(spec, jnp.float32)
    decode = make_decode_fn(spec, jnp.float32)

    def run(backend):
        set_attention_backend(backend)
        caches = init_kv_cache(spec, B, max_len, jnp.float32)
        logits, caches, kvd = prefill(params, jnp.asarray(ids), lens, caches)
        tok = jnp.argmax(logits, -1)
        logits, _, _ = decode(params, tok, lens, jnp.int32(T), kvd, caches)
        return np.asarray(logits)

    try:
        a = run("xla")
        b = run("pallas_interpret")
    finally:
        set_attention_backend("auto")
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)
