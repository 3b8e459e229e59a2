"""Device-side sampling: semantics, determinism, and distribution checks.

Covers VERDICT r3 item 5 — sampling moved into the jitted decode step
(reference analog: HF generate's on-accelerator LogitsProcessors,
reference gptqmodel/models/base.py:1464).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptqmodel_tpu.inference.sampling import sample_tokens


def _draws(logits, n, temp, top_k=0, top_p=1.0, seed=0):
    B, V = logits.shape
    f = jax.jit(sample_tokens)
    t = jnp.full((B,), temp, jnp.float32)
    k = jnp.full((B,), top_k, jnp.int32)
    p = jnp.full((B,), top_p, jnp.float32)
    out = []
    for i in range(n):
        out.append(np.asarray(f(logits, jax.random.fold_in(
            jax.random.PRNGKey(seed), i), t, k, p)))
    return np.stack(out)  # [n, B]


def test_greedy_matches_argmax():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    toks = _draws(logits, 3, temp=0.0)
    assert (toks == np.argmax(np.asarray(logits), -1)[None]).all()


def test_mixed_batch_greedy_rows_stay_greedy():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((3, 32)), jnp.float32)
    t = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    k = jnp.zeros(3, jnp.int32)
    p = jnp.ones(3, jnp.float32)
    for i in range(8):
        toks = np.asarray(sample_tokens(
            logits, jax.random.PRNGKey(i), t, k, p))
        assert toks[0] == int(np.argmax(np.asarray(logits)[0]))
        assert toks[2] == int(np.argmax(np.asarray(logits)[2]))


def test_fixed_key_deterministic():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((2, 128)), jnp.float32)
    a = _draws(logits, 16, temp=0.9, top_k=20, top_p=0.9, seed=7)
    b = _draws(logits, 16, temp=0.9, top_k=20, top_p=0.9, seed=7)
    assert (a == b).all()
    c = _draws(logits, 16, temp=0.9, top_k=20, top_p=0.9, seed=8)
    assert (a != c).any()


def test_top_k_support():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((2, 50)), jnp.float32)
    toks = _draws(logits, 200, temp=1.5, top_k=3)
    for b in range(2):
        top3 = set(np.argsort(-np.asarray(logits)[b])[:3].tolist())
        assert set(toks[:, b].tolist()) <= top3
        assert len(set(toks[:, b].tolist())) > 1  # actually stochastic


def test_top_p_nucleus_support():
    # probs 0.5/0.3/0.15/0.05: top_p=0.8 keeps exactly {0, 1} (the cut is on
    # cumulative mass BEFORE the element; first element always kept)
    probs = np.array([0.5, 0.3, 0.15, 0.05])
    logits = jnp.asarray(np.log(probs)[None], jnp.float32)
    toks = _draws(logits, 300, temp=1.0, top_p=0.8)
    assert set(toks[:, 0].tolist()) <= {0, 1}
    assert len(set(toks[:, 0].tolist())) == 2


def test_temperature_distribution():
    # temp=1, no cuts: empirical frequencies match softmax(logits) within 4
    # sigma of the multinomial std on 4000 draws
    probs = np.array([0.45, 0.25, 0.15, 0.08, 0.04, 0.02, 0.007, 0.003])
    logits = jnp.asarray(np.log(probs)[None], jnp.float32)
    n = 4000
    toks = _draws(logits, n, temp=1.0)
    freq = np.bincount(toks[:, 0], minlength=8) / n
    sigma = np.sqrt(probs * (1 - probs) / n)
    assert (np.abs(freq - probs) < 4 * sigma + 1e-3).all(), (freq, probs)


def test_high_temperature_flattens():
    probs = np.array([0.7, 0.2, 0.06, 0.04])
    logits = jnp.asarray(np.log(probs)[None], jnp.float32)
    hot = _draws(logits, 800, temp=8.0)
    freq = np.bincount(hot[:, 0], minlength=4) / 800
    # at temp 8 the distribution is nearly uniform; every token shows up
    assert (freq > 0.1).all(), freq


def test_engine_device_sampling_deterministic_and_plausible():
    """Engine-level: same seed -> identical stochastic output; sampled
    tokens differ from pure greedy but stay plausible (finite ids)."""
    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine
    from gptqmodel_tpu.utils.testing import random_dense_params, tiny_spec

    spec = tiny_spec(hidden=64, layers=1, heads=4, kv_heads=2, inter=128,
                     vocab=64)
    params = random_dense_params(spec, seed=5)
    outs = []
    for _ in range(2):
        eng = ContinuousBatchingEngine(
            spec, params, max_slots=2, max_len=64, dtype=jnp.float32, seed=11)
        outs.append(eng.generate(
            [5, 6, 7], max_new_tokens=8, temperature=1.2, top_k=8))
    assert outs[0] == outs[1]
    eng = ContinuousBatchingEngine(
        spec, params, max_slots=2, max_len=64, dtype=jnp.float32, seed=11)
    greedy = eng.generate([5, 6, 7], max_new_tokens=8)
    assert all(0 <= t < spec.vocab_size for t in outs[0])
    assert outs[0] != greedy  # stochastic at temp 1.2 on a random model


def test_min_p_support():
    # probs 0.6/0.25/0.1/0.05; min_p=0.3 keeps p >= 0.3*0.6=0.18 -> {0, 1}
    probs = np.array([0.6, 0.25, 0.1, 0.05])
    logits = jnp.asarray(np.log(probs)[None], jnp.float32)
    f = jax.jit(sample_tokens)
    toks = []
    for i in range(300):
        toks.append(int(f(
            logits, jax.random.fold_in(jax.random.PRNGKey(3), i),
            jnp.asarray([1.0], jnp.float32), jnp.asarray([0], jnp.int32),
            jnp.asarray([1.0], jnp.float32),
            jnp.asarray([0.3], jnp.float32))[0]))
    assert set(toks) <= {0, 1} and len(set(toks)) == 2
    # min_p=0 disables the cut (all four reachable at temp 2)
    toks = []
    for i in range(600):
        toks.append(int(f(
            logits * 0.5, jax.random.fold_in(jax.random.PRNGKey(4), i),
            jnp.asarray([1.0], jnp.float32), jnp.asarray([0], jnp.int32),
            jnp.asarray([1.0], jnp.float32),
            jnp.asarray([0.0], jnp.float32))[0]))
    assert set(toks) == {0, 1, 2, 3}


def test_min_p_runs_after_top_p_like_hf():
    """Warper ORDER matters (review finding): with sorted probs
    [0.35, 0.30, 0.20, 0.15], top_p=0.72, min_p=0.5 — HF's chain
    (TopP first: keeps {0,1,2} since cum-before = 0.65 < 0.72; then MinP
    on the masked dist: max renorm p = 0.412, cut 0.5*0.412 = 0.206 ->
    drops p2=0.235? no: 0.235 >= 0.206 keeps {0,1,2}) — min_p-first
    would instead drop token 2. Assert token 2 IS sampled."""
    probs = np.array([0.35, 0.30, 0.20, 0.15])
    logits = jnp.asarray(np.log(probs)[None], jnp.float32)
    f = jax.jit(sample_tokens)
    toks = set()
    for i in range(500):
        toks.add(int(f(
            logits, jax.random.fold_in(jax.random.PRNGKey(9), i),
            jnp.asarray([1.0], jnp.float32), jnp.asarray([0], jnp.int32),
            jnp.asarray([0.72], jnp.float32),
            jnp.asarray([0.5], jnp.float32))[0]))
    assert toks == {0, 1, 2}, toks
