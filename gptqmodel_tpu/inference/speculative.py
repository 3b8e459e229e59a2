"""Prompt-lookup speculative decoding (draft-model-free).

Beyond the reference's serving surface (it delegates decode to HF
``generate`` / vLLM): TPU decode is WEIGHT-STREAMING-bound, so a verify
forward over ``k+1`` tokens costs nearly the same wall time as a 1-token
decode step (the packed weights stream once either way; only the tiny
activation row count grows). Draft tokens that verify are therefore almost
free throughput. Drafts come from PROMPT LOOKUP (n-gram continuation — the
transformers ``prompt_lookup_num_tokens`` idea): find the most recent
earlier occurrence of the current tail n-gram in the sequence history and
propose the tokens that followed it.

Greedy acceptance is EXACT: emitted tokens equal plain greedy decode
token-for-token (tests/test_speculative.py asserts it sequence-wise),
because a draft is accepted only when it equals the model's own argmax at
that position, and the bonus token is the model's argmax after the last
accepted draft.

Cache discipline reuses the engine's logical/physical decoupling
(inference/engine.py): every row writes the k+1 block at the same physical
slots; per-row ``key_valid`` marks only the accepted prefix valid, so
rejected slots are simply never attended (no rollback copies). The
physical pointer advances by ``1 + max_accepted`` across the batch —
rows that accepted fewer tokens leave dead slots, so ``max_len`` needs
headroom proportional to the rejection rate (worst case k× the token
budget; pass a larger ``max_len`` for adversarial inputs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gptqmodel_tpu.models.spec import ModelSpec
from gptqmodel_tpu.models.transformer import (
    any_decoder_layer,
    embed,
    final_norm,
    has_sliding_layers,
    layer_rope_bias,
    lm_logits,
    model_layers,
    rope_cos_sin,
)

_NEG = float(np.finfo(np.float32).min)


def make_verify_fn(spec: ModelSpec, dtype=jnp.bfloat16):
    """(params, tokens [B, k+1], logical_pos [B], write_slot scalar,
    key_valid, caches) -> (logits [B, k+1, V], caches, key_valid).

    tokens[:, 0] is the COMMITTED last token (its KV is written and marked
    valid); tokens[:, 1:] are drafts. Queries attend all previously-valid
    slots plus the causal prefix of the new block. key_valid is returned
    with only slot ``write_slot`` marked (the committed token); the host
    marks accepted draft slots per row after comparing argmaxes."""

    @jax.jit
    def verify(params, tokens, logical_pos, write_slot, key_valid, caches):
        B, K1 = tokens.shape
        L = key_valid.shape[1]
        positions = logical_pos[:, None] + jnp.arange(K1)[None, :]  # [B,K1]
        cos, sin = rope_cos_sin(spec, positions)
        ki = jnp.arange(L)[None, None, :]  # [1, 1, L]
        qj = jnp.arange(K1)[None, :, None]  # [1, K1, 1]
        new_blk = (ki >= write_slot) & (ki <= write_slot + qj)
        ok = key_valid[:, None, :] | new_blk  # [B, K1, L]
        ctx = {"cos": cos, "sin": sin,
               "bias": jnp.where(ok, 0.0, _NEG)[:, None]}
        if has_sliding_layers(spec):
            ctx["cos_l"], ctx["sin_l"] = rope_cos_sin(
                spec, positions, local=True)
            ok_l = ok & (ki > write_slot + qj - spec.sliding_window)
            ctx["bias_l"] = jnp.where(ok_l, 0.0, _NEG)[:, None]
        h = embed(spec, params, tokens, dtype, positions)
        new_caches = []
        for i, lp in enumerate(model_layers(spec, params)):
            c = dict(caches[i], pos=write_slot)
            cos_i, sin_i, bias_i = layer_rope_bias(spec, i, ctx)
            h, c = any_decoder_layer(spec, lp, h, cos_i, sin_i, bias_i, c)
            new_caches.append({k: v for k, v in c.items() if k != "pos"})
        h = final_norm(spec, params, h)
        logits = lm_logits(spec, params, h)  # [B, K1, V]
        key_valid = key_valid.at[:, write_slot].set(True)
        return logits, new_caches, key_valid

    return verify


def propose_lookup(history: list[int], k: int, max_ngram: int = 3,
                   pad: int = 0) -> list[int]:
    """Draft ``k`` tokens by continuing the most recent earlier occurrence
    of the longest matching tail n-gram (transformers' prompt-lookup)."""
    n_hist = len(history)
    for n in range(min(max_ngram, n_hist - 1), 0, -1):
        tail = history[-n:]
        # most recent earlier occurrence (exclude the tail itself)
        for s in range(n_hist - n - 1, -1, -1):
            if history[s:s + n] == tail:
                cont = history[s + n:s + n + k]
                if cont:
                    return (cont + [pad] * k)[:k]
    return [pad] * k


def speculative_generate(
    spec: ModelSpec,
    params,
    input_ids: np.ndarray,  # [B, T] right-padded
    prompt_lens: Optional[np.ndarray] = None,
    max_new_tokens: int = 32,
    k: int = 4,
    eos_token_id: Optional[int] = None,
    dtype=jnp.bfloat16,
    max_len: Optional[int] = None,
    kv_quant: bool | str = False,
) -> tuple[np.ndarray, dict]:
    """Greedy decode with prompt-lookup speculation.

    Returns (tokens [B, max_new_tokens], stats) — token-identical to
    :func:`inference.engine.greedy_generate`. ``stats['accept_rate']`` is
    mean accepted drafts per verify step (0..k)."""
    from gptqmodel_tpu.inference.engine import init_kv_cache, make_prefill_fn

    B, T = input_ids.shape
    if prompt_lens is None:
        prompt_lens = np.full((B,), T, dtype=np.int32)
    # physical headroom: every verify advances the pointer by up to k+1
    # regardless of per-row acceptance
    max_len = max_len or (T + (max_new_tokens + 1) * (k + 1))
    caches = init_kv_cache(spec, B, max_len, dtype, kv_quant=kv_quant)
    prefill = make_prefill_fn(spec, dtype)
    verify = make_verify_fn(spec, dtype)

    lens = jnp.asarray(prompt_lens, jnp.int32)
    logits, caches, key_valid = prefill(
        params, jnp.asarray(input_ids), lens, caches)
    token = np.asarray(jnp.argmax(logits, axis=-1))

    history = [list(input_ids[b, :prompt_lens[b]]) + [int(token[b])]
               for b in range(B)]
    out = [[int(token[b])] for b in range(B)]
    logical = prompt_lens.astype(np.int64).copy()  # position of `token`
    write = T  # physical slot of `token`
    done = np.zeros(B, bool)
    n_verify, n_accept = 0, 0

    while min(len(o) for o in out) < max_new_tokens and not done.all():
        drafts = np.stack([
            np.asarray(propose_lookup(history[b], k), np.int64)
            for b in range(B)
        ])
        tokens = np.concatenate([token[:, None], drafts], axis=1)  # [B,k+1]
        logits, caches, key_valid = verify(
            params, jnp.asarray(tokens, jnp.int32),
            jnp.asarray(logical, jnp.int32), jnp.int32(write),
            key_valid, caches)
        preds = np.asarray(jnp.argmax(logits, axis=-1))  # [B, k+1]
        # longest accepted prefix: drafts[j] == preds[j] (model argmax after
        # consuming tokens[0..j]); then one bonus token preds[a]
        acc = np.zeros(B, np.int64)
        valid_rows = []
        for b in range(B):
            a = 0
            while a < k and drafts[b, a] == preds[b, a]:
                a += 1
            acc[b] = a
            emitted = [int(x) for x in preds[b, :a + 1]]  # a drafts + bonus
            if done[b]:
                emitted = []
            for t in emitted:
                if len(out[b]) >= max_new_tokens or done[b]:
                    break
                out[b].append(t)
                history[b].append(t)
                if eos_token_id is not None and np.isin(
                        t, np.atleast_1d(eos_token_id)).any():
                    done[b] = True
            # mark accepted draft slots valid: slots write+1 .. write+a
            row = np.zeros(max_len, bool)
            row[write + 1:write + 1 + a] = True
            valid_rows.append(row)
        key_valid = jnp.logical_or(
            key_valid, jnp.asarray(np.stack(valid_rows)))
        n_verify += 1
        n_accept += int(acc.sum())
        token = preds[np.arange(B), acc]  # the bonus token
        logical = logical + acc + 1
        write = write + 1 + int(acc.max())
        if write + k + 1 > max_len:
            break  # out of physical headroom (caller can raise max_len)

    arr = np.full((B, max_new_tokens), eos_token_id or 0, np.int64)
    for b in range(B):
        arr[b, :min(len(out[b]), max_new_tokens)] = \
            out[b][:max_new_tokens]
    stats = {
        "verify_steps": n_verify,
        "accept_rate": (n_accept / max(n_verify * B, 1)),
        "tokens_per_step": (sum(len(o) for o in out) / max(n_verify * B, 1)),
    }
    return arr, stats
