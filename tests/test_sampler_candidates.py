"""Two-stage candidate sampler (round 5): must match the full-sort sampler's
distribution EXACTLY in every regime — candidate-covered cuts, no-cut
temperature rows, min_p thresholds, and the lax.cond fallback when a row's
cut set cannot fit the candidate budget (top_k > C, or nucleus mass beyond
the candidates)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gptqmodel_tpu.inference.sampling as samp


def _hist(fn, logits, temp, topk, topp, minp, n=20000):
    toks = jax.vmap(
        lambda k: fn(logits, k, temp, topk, topp, minp)
    )(jax.random.split(jax.random.PRNGKey(1), n))
    return np.bincount(np.asarray(toks).ravel(),
                       minlength=logits.shape[-1]) / (n * logits.shape[0])


@pytest.mark.parametrize("knobs", [
    dict(topk=8, topp=1.0, minp=0.0),     # candidate top-k
    dict(topk=0, topp=0.7, minp=0.0),     # candidate nucleus (fits C)
    dict(topk=0, topp=1.0, minp=0.0),     # no-cut pure temperature
    dict(topk=0, topp=1.0, minp=0.08),    # no-cut + min_p threshold
    dict(topk=6, topp=0.8, minp=0.05),    # all three chained
    dict(topk=40, topp=1.0, minp=0.0),    # top_k > C -> full-sort fallback
    dict(topk=0, topp=0.999, minp=0.0),   # nucleus beyond C -> fallback
])
def test_candidate_sampler_matches_sort_distribution(knobs, monkeypatch):
    monkeypatch.setattr(samp, "_SAMPLER", "candidates")
    monkeypatch.setattr(samp, "_CANDIDATES", 8)  # tiny C to exercise paths
    rng = np.random.default_rng(0)
    V = 48
    logits = jnp.asarray(rng.standard_normal((2, V)) * 2.0, jnp.float32)
    temp = jnp.asarray([0.8, 1.3], jnp.float32)
    topk = jnp.full((2,), knobs["topk"], jnp.int32)
    topp = jnp.full((2,), knobs["topp"], jnp.float32)
    minp = jnp.full((2,), knobs["minp"], jnp.float32)

    p_ref = np.asarray(samp.warped_probs(logits, temp, topk, topp, minp))
    h = _hist(samp.sample_tokens, logits, temp, topk, topp, minp)
    # per-bin 4-sigma vs the analytic distribution (averaged over 2 rows)
    p_mean = p_ref.mean(axis=0)
    n = 20000 * 2
    for v in range(V):
        if p_mean[v] == 0.0:
            assert h[v] == 0.0, (knobs, v)
        else:
            sigma = np.sqrt(p_mean[v] * (1 - p_mean[v]) / n)
            assert abs(h[v] - p_mean[v]) < 4 * sigma + 1e-4, (
                knobs, v, h[v], p_mean[v])


def test_candidate_sampler_greedy_rows_exact(monkeypatch):
    monkeypatch.setattr(samp, "_SAMPLER", "candidates")
    monkeypatch.setattr(samp, "_CANDIDATES", 8)
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    temp = jnp.asarray([0.0, 0.9, 0.0, 1.1], jnp.float32)
    toks = samp.sample_tokens(
        logits, jax.random.PRNGKey(0), temp,
        jnp.asarray([0, 4, 0, 4], jnp.int32),
        jnp.ones(4, jnp.float32), jnp.zeros(4, jnp.float32))
    am = np.argmax(np.asarray(logits), axis=-1)
    assert int(toks[0]) == am[0] and int(toks[2]) == am[2]


def test_sampler_mode_gate_small_vocab(monkeypatch):
    """V <= 4*C keeps the default warp path (candidate overhead not worth
    it): candidates mode and warp mode draw the identical token."""
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((1, 32)), jnp.float32)
    t = jnp.asarray([0.9], jnp.float32)
    k = jnp.asarray([8], jnp.int32)
    p1 = jnp.asarray([0.9], jnp.float32)
    m = jnp.asarray([0.0], jnp.float32)
    monkeypatch.setattr(samp, "_SAMPLER", "candidates")
    a = samp.sample_tokens(logits, jax.random.PRNGKey(7), t, k, p1, m)
    monkeypatch.setattr(samp, "_SAMPLER", "warp")
    b = samp.sample_tokens(logits, jax.random.PRNGKey(7), t, k, p1, m)
    assert int(a[0]) == int(b[0])
