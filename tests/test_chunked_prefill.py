"""Chunked (online-softmax) prefill attention vs the dense-bias path.

The dense [B, 1, T, max_len] bias is quadratic in context (engine.py); long
prompts switch to transformer.LazyCausalBias + _chunked_causal_attention.
Equality to the dense path is the correctness contract (VERDICT r2 item 8).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptqmodel_tpu.models.transformer import (
    LazyCausalBias,
    _chunked_causal_attention,
)


def _dense_ref(spec, q, k, v, lb, scale, rep, sinks=None):
    """The attention() dense-branch math, inlined."""
    B, Hkv, S, D = k.shape
    T = q.shape[2]
    bias = lb.materialize()
    qg = q.reshape(B, Hkv, rep, T, D)
    logits = jnp.einsum(
        "bgrqd,bgkd->bgrqk", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if spec.attn_softcap:
        logits = jnp.tanh(logits / spec.attn_softcap) * spec.attn_softcap
    logits = logits + bias.astype(logits.dtype)[:, :, None]
    if sinks is not None:
        sk = sinks.reshape(1, Hkv, rep, 1, 1).astype(jnp.float32)
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), sk)
        e = jnp.exp(logits - m)
        probs = (e / (jnp.sum(e, -1, keepdims=True) + jnp.exp(sk - m))).astype(q.dtype)
    else:
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bgrqk,bgkd->bgrqd", probs, v.astype(q.dtype))
    return out.reshape(B, Hkv * rep, T, D)


class _Spec:
    attn_softcap = 0.0


@pytest.mark.parametrize("rep,window,softcap,with_sinks", [
    (1, 0, 0.0, False),
    (4, 0, 0.0, False),
    (4, 64, 0.0, False),   # sliding window
    (2, 0, 30.0, False),   # gemma softcap
    (4, 0, 0.0, True),     # gpt_oss sinks
])
def test_chunked_matches_dense(rep, window, softcap, with_sinks):
    rng = np.random.default_rng(0)
    B, Hkv, T, S, D = 2, 2, 96, 160, 64
    H = Hkv * rep
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    lens = jnp.asarray([T, T // 2], jnp.int32)
    lb = LazyCausalBias(lens, T, S, window=window)
    spec = _Spec()
    spec.attn_softcap = softcap
    sinks = (
        jnp.asarray(rng.standard_normal(H), jnp.float32) if with_sinks else None
    )
    scale = D**-0.5

    ref = np.asarray(_dense_ref(spec, q, k, v, lb, scale, rep, sinks))
    got = np.asarray(
        _chunked_causal_attention(spec, q, k, v, lb, scale, rep, sinks=sinks,
                                  chunk=64)
    )
    # rows past a sequence's prompt_len attend to nothing valid (fully
    # masked) — the engine never reads them; exclude from comparison
    valid_rows = np.arange(T)[None, :] < np.asarray(lens)[:, None]
    mask = valid_rows[:, None, :, None]
    np.testing.assert_allclose(
        np.where(mask, got, 0.0), np.where(mask, ref, 0.0),
        rtol=2e-5, atol=2e-5,
    )


def test_engine_prefill_chunked_matches_dense(monkeypatch):
    """Whole-engine check: same logits with the chunked path forced on."""
    from gptqmodel_tpu.inference.engine import init_kv_cache, make_prefill_fn
    from gptqmodel_tpu.utils.testing import (
        quantize_params_rtn, random_dense_params, tiny_spec,
    )

    spec = tiny_spec(hidden=128, layers=2, heads=4, kv_heads=2, inter=256,
                     vocab=256)
    params = quantize_params_rtn(random_dense_params(spec), bits=4,
                                 group_size=64)
    B, T, max_len = 2, 24, 40
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 256, size=(B, T)), jnp.int32)
    lens = jnp.asarray([T, T - 5], jnp.int32)

    monkeypatch.setenv("GPTQ_TPU_CHUNKED_PREFILL_T", "100000")
    caches = init_kv_cache(spec, B, max_len, jnp.float32)
    dense_logits, _, _ = make_prefill_fn(spec, jnp.float32)(
        params, ids, lens, caches
    )

    monkeypatch.setenv("GPTQ_TPU_CHUNKED_PREFILL_T", "1")
    caches2 = init_kv_cache(spec, B, max_len, jnp.float32)
    chunk_logits, caches2_out, _ = make_prefill_fn(spec, jnp.float32)(
        params, ids, lens, caches2
    )
    np.testing.assert_allclose(
        np.asarray(chunk_logits), np.asarray(dense_logits),
        rtol=2e-4, atol=2e-4,
    )


def test_chunked_nonpow2_length_keeps_full_chunks():
    """S with a tiny power-of-two divisor (e.g. 1000) must pad the ragged
    tail, not halve the chunk to slivers — and stay exact."""
    rng = np.random.default_rng(3)
    B, Hkv, rep, T, S, D = 2, 2, 72, 1000, 1000, 64
    T = 72
    H = Hkv * rep
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    lens = jnp.asarray([T, T - 9], jnp.int32)
    lb = LazyCausalBias(lens, T, S)
    spec = _Spec()
    scale = D**-0.5
    ref = np.asarray(_dense_ref(spec, q, k, v, lb, scale, rep))
    got = np.asarray(
        _chunked_causal_attention(spec, q, k, v, lb, scale, rep, chunk=512))
    valid_rows = np.arange(T)[None, :] < np.asarray(lens)[:, None]
    mask = valid_rows[:, None, :, None]
    np.testing.assert_allclose(
        np.where(mask, got, 0.0), np.where(mask, ref, 0.0),
        rtol=2e-5, atol=2e-5,
    )


def test_lazy_bias_dense_fallback_for_exotic_archs(monkeypatch):
    """Architectures whose attention adds the bias directly (OPT lineage,
    MLA, gpt2/bloom/neox) must not crash when the prefill context carries
    a LazyCausalBias — .astype materializes the dense bias (review
    finding: long-prompt prefill raised AttributeError there)."""
    from gptqmodel_tpu.inference.engine import init_kv_cache, make_prefill_fn
    from gptqmodel_tpu.utils.testing import (
        quantize_params_rtn, random_dense_params, tiny_spec,
    )

    spec = tiny_spec(hidden=128, layers=2, heads=4, kv_heads=4, inter=256,
                     vocab=256, model_type="opt")
    params = quantize_params_rtn(random_dense_params(spec), bits=4,
                                 group_size=64)
    B, T, max_len = 2, 24, 40
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(1, 256, size=(B, T)), jnp.int32)
    lens = jnp.asarray([T, T - 5], jnp.int32)

    monkeypatch.setenv("GPTQ_TPU_CHUNKED_PREFILL_T", "100000")
    caches = init_kv_cache(spec, B, max_len, jnp.float32)
    dense_logits, _, _ = make_prefill_fn(spec, jnp.float32)(
        params, ids, lens, caches)

    monkeypatch.setenv("GPTQ_TPU_CHUNKED_PREFILL_T", "1")
    caches2 = init_kv_cache(spec, B, max_len, jnp.float32)
    lazy_logits, _, _ = make_prefill_fn(spec, jnp.float32)(
        params, ids, lens, caches2)
    np.testing.assert_allclose(
        np.asarray(lazy_logits), np.asarray(dense_logits),
        rtol=2e-4, atol=2e-4,
    )
