"""int8 KV-cache tests: fidelity vs fp cache, both engine paths."""

import numpy as np

import jax.numpy as jnp

from gptqmodel_tpu.utils.testing import random_dense_params, tiny_spec


def test_kv_int8_decode_close_to_fp():
    from gptqmodel_tpu.inference.engine import (
        init_kv_cache,
        make_decode_fn,
        make_prefill_fn,
    )

    spec = tiny_spec(hidden=64, layers=2, heads=4, kv_heads=2, inter=128, vocab=128)
    params = random_dense_params(spec, seed=0)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 120, size=(2, 12)).astype(np.int32)
    lens = jnp.full((2,), 12, jnp.int32)

    prefill = make_prefill_fn(spec, jnp.float32)
    decode = make_decode_fn(spec, jnp.float32)

    outs = {}
    for kv_quant in (False, True):
        caches = init_kv_cache(spec, 2, 32, jnp.float32, kv_quant=kv_quant)
        if kv_quant:
            assert caches[0]["k"].dtype == jnp.int8
            assert "k_s" in caches[0]
        logits, caches, kvd = prefill(params, jnp.asarray(ids), lens, caches)
        tok = jnp.argmax(logits, axis=-1)
        l2, caches, kvd = decode(params, tok, lens, jnp.int32(12), kvd, caches)
        outs[kv_quant] = (np.asarray(logits, np.float32), np.asarray(l2, np.float32))

    for a, b in zip(outs[False], outs[True]):
        rel = np.linalg.norm(a - b) / np.linalg.norm(a)
        assert rel < 2e-2, rel  # int8 per-vector absmax: <1% typical


def test_kv_int8_scheduler_generates():
    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine

    spec = tiny_spec(hidden=64, layers=1, heads=4, kv_heads=2, inter=128, vocab=64)
    params = random_dense_params(spec, seed=2)
    eng_fp = ContinuousBatchingEngine(
        spec, params, max_slots=2, max_len=64, dtype=jnp.float32
    )
    eng_q = ContinuousBatchingEngine(
        spec, params, max_slots=2, max_len=64, dtype=jnp.float32, kv_quant=True
    )
    prompt = [5, 9, 3, 7, 11]
    a = eng_fp.generate(prompt, max_new_tokens=8)
    b = eng_q.generate(prompt, max_new_tokens=8)
    assert len(b) == 8
    # int8 KV rarely flips early greedy tokens on a tiny model
    assert a[:3] == b[:3], (a, b)


def test_kv_int4_decode_close_to_fp():
    """int4 KV (nibble-packed along D): 4x less cache HBM; fidelity within
    the coarser absmax-to-[-7,7] error."""
    from gptqmodel_tpu.inference.engine import (
        init_kv_cache,
        make_decode_fn,
        make_prefill_fn,
    )

    spec = tiny_spec(hidden=64, layers=2, heads=4, kv_heads=2, inter=128, vocab=128)
    params = random_dense_params(spec, seed=0)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 120, size=(2, 12)).astype(np.int32)
    lens = jnp.full((2,), 12, jnp.int32)

    prefill = make_prefill_fn(spec, jnp.float32)
    decode = make_decode_fn(spec, jnp.float32)

    outs = {}
    for kv_quant in (False, "int4"):
        caches = init_kv_cache(spec, 2, 32, jnp.float32, kv_quant=kv_quant)
        if kv_quant:
            assert caches[0]["k"].dtype == jnp.uint8
            assert caches[0]["k"].shape[-1] == spec.head_dim // 2
        logits, caches, kvd = prefill(params, jnp.asarray(ids), lens, caches)
        tok = jnp.argmax(logits, axis=-1)
        l2, caches, kvd = decode(params, tok, lens, jnp.int32(12), kvd, caches)
        outs[bool(kv_quant)] = (
            np.asarray(logits, np.float32), np.asarray(l2, np.float32)
        )

    for a, b in zip(outs[False], outs[True]):
        rel = np.linalg.norm(a - b) / np.linalg.norm(a)
        assert rel < 0.1, rel  # int4 absmax: coarser than int8 but bounded


def test_kv_int4_quantize_roundtrip_exact_grid():
    """Values already on the int4 grid survive the pack/unpack exactly."""
    from gptqmodel_tpu.models.transformer import _kv_dequantize_i4, _kv_quantize_i4

    rng = np.random.default_rng(3)
    t = rng.integers(-7, 8, size=(2, 3, 5, 8)).astype(np.float32)
    t[..., 0] = 7.0  # pin absmax so scales are exactly 1
    q, s = _kv_quantize_i4(jnp.asarray(t))
    assert q.shape == (2, 3, 5, 4) and q.dtype == jnp.uint8
    back = np.asarray(_kv_dequantize_i4(q, s, jnp.float32))
    np.testing.assert_allclose(back, t, atol=1e-5)
