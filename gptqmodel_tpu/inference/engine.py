"""KV-cache inference engine: jitted prefill + decode steps.

TPU-native replacement for the reference's delegation to HF
``GenerationMixin.generate`` (gptqmodel/models/base.py:1464): two compiled
programs — a prefill over the full prompt and a single-token decode step —
with a static-size KV cache updated via dynamic_update_slice, so shapes never
change and XLA compiles each exactly once per (batch, maxlen).

Ragged batches (continuous batching) use the standard decoupling:
- **physical** cache slots are uniform across the batch (one write pointer),
- **logical** positions are per-sequence and drive RoPE,
- attention sees a per-slot ``key_valid [B, max_len]`` mask instead of a
  positional causal mask, so pad slots and future slots are never attended.
"""

from __future__ import annotations

import os
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


def _kv_slot(k_shape, v_shape, dtype, mode):
    """One attention layer's KV slot (bf16 | int8 | int4-packed)."""
    c = {"pos": jnp.int32(0)}
    if mode == "int4":
        c["k"] = jnp.zeros(k_shape[:3] + (k_shape[3] // 2,), jnp.uint8)
        c["v"] = jnp.zeros(v_shape[:3] + (v_shape[3] // 2,), jnp.uint8)
        c["k_s"] = jnp.zeros(k_shape[:3], jnp.float32)
        c["v_s"] = jnp.zeros(v_shape[:3], jnp.float32)
    elif mode == "int8":
        c["k"] = jnp.zeros(k_shape, jnp.int8)
        c["v"] = jnp.zeros(v_shape, jnp.int8)
        c["k_s"] = jnp.zeros(k_shape[:3], jnp.float32)
        c["v_s"] = jnp.zeros(v_shape[:3], jnp.float32)
    else:
        c["k"] = jnp.zeros(k_shape, dtype)
        c["v"] = jnp.zeros(v_shape, dtype)
    return c


def init_kv_cache(
    spec: ModelSpec, batch: int, max_len: int, dtype=jnp.bfloat16,
    kv_quant: bool | str = False,
):
    """Per-layer {"k","v"} [B, Hkv, max_len, D]; physical write pointer is
    threaded separately (uniform across the batch). ``kv_quant``:
    True/"int8" stores K/V as int8 with per-(b,h,pos) scales (half the cache
    HBM); "int4" packs two nibbles per byte (quarter — the PAPERS.md 2-4x
    longer-context lineage). MLA models (deepseek) have distinct k
    (nope+rope) and v (v_head_dim) dims."""
    if spec.family == "mamba":  # conv+ssm state caches, no KV
        from gptqmodel_tpu.models.transformer import init_mamba_cache

        return init_mamba_cache(spec, batch, dtype)
    k_shape = (batch, spec.num_kv_heads, max_len, spec.head_dim)
    v_dim = spec.v_head_dim if spec.mla else spec.head_dim
    v_shape = (batch, spec.num_kv_heads, max_len, v_dim)
    mode = {True: "int8", False: None}.get(kv_quant, kv_quant)
    assert mode in (None, "int8", "int4"), kv_quant
    mamba_layer = None
    if spec.layers_block_type and "mamba" in spec.layers_block_type:
        from gptqmodel_tpu.models.transformer import init_mamba_cache

        mamba_layer = init_mamba_cache(spec, batch, dtype)
    caches = []
    for li in range(spec.num_layers):
        if (spec.layers_block_type
                and spec.layers_block_type[li] == "mamba"):
            caches.append(mamba_layer[li])
            continue
        if (spec.layers_block_type
                and spec.layers_block_type[li] == "conv"):  # lfm2 short conv
            caches.append({
                "conv": jnp.zeros(
                    (batch, spec.mamba_d_conv - 1, spec.hidden_size), dtype
                ),
            })
            continue
        if (spec.layers_block_type
                and spec.layers_block_type[li] == "lightning"):  # minimax
            caches.append({
                "KV": jnp.zeros(
                    (batch, spec.num_heads, spec.head_dim, spec.head_dim),
                    jnp.float32,
                ),
            })
            continue
        if (spec.layers_block_type
                and spec.layers_block_type[li] == "linear"):  # qwen3_next
            conv_dim = (2 * spec.linear_num_k_heads * spec.linear_k_head_dim
                        + spec.linear_num_v_heads * spec.linear_v_head_dim)
            caches.append({
                "conv": jnp.zeros(
                    (batch, spec.mamba_d_conv - 1, conv_dim), dtype
                ),
                "S": jnp.zeros(
                    (batch, spec.linear_num_v_heads, spec.linear_k_head_dim,
                     spec.linear_v_head_dim), jnp.float32,
                ),
            })
            continue
        if spec.layer_kv_heads:  # decilm/nemotron-nas per-layer GQA
            kvh_l = spec.layer_kv_heads[li]
            if kvh_l == 0:  # attention-free NAS block: no cache slot
                caches.append({"pos": jnp.int32(0)})
                continue
            if kvh_l != spec.num_kv_heads:
                caches.append(_kv_slot(
                    (batch, kvh_l, max_len, spec.head_dim),
                    (batch, kvh_l, max_len, v_dim), dtype, mode))
                continue
        c = {"pos": jnp.int32(0)}
        if spec.longcat:  # dual attention sublayers per logical layer
            c["k"] = jnp.zeros(k_shape, dtype)
            c["v"] = jnp.zeros(v_shape, dtype)
            c["k2"] = jnp.zeros(k_shape, dtype)
            c["v2"] = jnp.zeros(v_shape, dtype)
            caches.append(c)
            continue
        if spec.falcon_h1:  # parallel hybrid: KV + (conv, ssm) in one dict
            conv_dim = (spec.mamba_d_inner
                        + 2 * spec.mamba_n_groups * spec.mamba_d_state)
            hd_m = spec.mamba_d_inner // spec.mamba_n_heads
            c["conv"] = jnp.zeros(
                (batch, spec.mamba_d_conv - 1, conv_dim), dtype
            )
            c["ssm"] = jnp.zeros(
                (batch, spec.mamba_n_heads, hd_m, spec.mamba_d_state),
                jnp.float32,
            )
        if mode == "int4":
            c["k"] = jnp.zeros(k_shape[:3] + (k_shape[3] // 2,), jnp.uint8)
            c["v"] = jnp.zeros(v_shape[:3] + (v_shape[3] // 2,), jnp.uint8)
            c["k_s"] = jnp.zeros(k_shape[:3], jnp.float32)
            c["v_s"] = jnp.zeros(v_shape[:3], jnp.float32)
        elif mode == "int8":
            c["k"] = jnp.zeros(k_shape, jnp.int8)
            c["v"] = jnp.zeros(v_shape, jnp.int8)
            c["k_s"] = jnp.zeros(k_shape[:3], jnp.float32)
            c["v_s"] = jnp.zeros(v_shape[:3], jnp.float32)
        else:
            c["k"] = jnp.zeros(k_shape, dtype)
            c["v"] = jnp.zeros(v_shape, dtype)
        caches.append(c)
    return caches


def _stack_forward(spec, params, h, ctx, caches):
    new_caches = []
    for i, lp in enumerate(model_layers(spec, params)):
        cos_i, sin_i, bias_i = layer_rope_bias(spec, i, ctx)
        h, c = any_decoder_layer(spec, lp, h, cos_i, sin_i, bias_i, caches[i])
        new_caches.append(c)
    return final_norm(spec, params, h), new_caches


def make_prefill_fn(spec: ModelSpec, dtype=jnp.bfloat16):
    """(params, ids [B,T], prompt_lens [B], caches) ->
    (last-token logits [B,V], caches, key_valid [B, max_len]).

    Prompts are right-padded; K/V land in physical slots [0, T); pad slots
    are written but excluded from ``key_valid`` forever.
    """

    if spec.family == "mamba":

        @jax.jit
        def prefill_mamba(params, ids, prompt_lens, caches):
            B, T = ids.shape
            h = embed(spec, params, ids, dtype)
            # mask padded rows out of the recurrence (HF attention_mask on
            # the mixer inputs); exact for right-padding
            valid = (jnp.arange(T)[None, :] < prompt_lens[:, None])
            h = h * valid[:, :, None].astype(h.dtype)
            ctx = {"cos": None, "sin": None, "bias": None}
            h, caches = _stack_forward(spec, params, h, ctx, caches)
            idx = jnp.clip(prompt_lens - 1, 0, T - 1)
            h_last = jnp.take_along_axis(h, idx[:, None, None], axis=1)
            logits = lm_logits(spec, params, h_last)[:, 0]
            return logits, caches, valid

        return prefill_mamba

    @jax.jit
    def prefill(params, ids, prompt_lens, caches):
        B, T = ids.shape
        max_len = next(c["k"].shape[2] for c in caches if "k" in c)
        positions = jnp.broadcast_to(jnp.arange(T), (B, T))
        cos, sin = rope_cos_sin(spec, positions)
        key_valid = jnp.arange(max_len)[None, :] < prompt_lens[:, None]
        # long prompts: the dense [B, 1, T, max_len] bias (and the [B, H, T,
        # S] logits it implies) are quadratic in context — swap to the
        # index-carried mask + chunked online-softmax attention
        # (transformer.LazyCausalBias); short prompts keep the dense path
        # (XLA fuses it; the chunk scan only pays off once the quadratic
        # tensors dominate)
        chunked_t = int(os.environ.get("GPTQ_TPU_CHUNKED_PREFILL_T", "1024"))
        if T >= chunked_t:
            from gptqmodel_tpu.models.transformer import LazyCausalBias

            bias = LazyCausalBias(prompt_lens, T, max_len)
            ctx = {"cos": cos, "sin": sin, "bias": bias}
            if has_sliding_layers(spec):
                ctx["cos_l"], ctx["sin_l"] = rope_cos_sin(
                    spec, positions, local=True
                )
                ctx["bias_l"] = LazyCausalBias(
                    prompt_lens, T, max_len, window=spec.sliding_window
                )
        else:
            qi = jnp.arange(T)[:, None]
            ki = jnp.arange(max_len)[None, :]
            ok = (ki <= qi)[None, :, :] & key_valid[:, None, :]
            bias = jnp.where(ok, 0.0, _NEG)[:, None]  # [B, 1, T, max_len]
            ctx = {"cos": cos, "sin": sin, "bias": bias}
            if has_sliding_layers(spec):  # gemma3: local rope + windowed mask
                ctx["cos_l"], ctx["sin_l"] = rope_cos_sin(spec, positions, local=True)
                ok_l = ok & (ki > qi - spec.sliding_window)[None]
                ctx["bias_l"] = jnp.where(ok_l, 0.0, _NEG)[:, None]
        h = embed(spec, params, ids, dtype, positions)
        h, caches = _stack_forward(spec, params, h, ctx, caches)
        last = jnp.take_along_axis(h, (prompt_lens - 1)[:, None, None], axis=1)
        logits = lm_logits(spec, params, last)[:, 0]
        return logits, caches, key_valid

    return prefill


def make_decode_fn(spec: ModelSpec, dtype=jnp.bfloat16):
    """(params, token [B], logical_pos [B], write_slot scalar, key_valid,
    caches) -> (logits [B,V], caches, key_valid).

    ``logical_pos`` drives RoPE per sequence; all sequences write K/V at the
    same physical ``write_slot`` (marked valid before attention so the token
    attends to itself).
    """

    if spec.family == "mamba":

        @jax.jit
        def decode_mamba(params, token, logical_pos, write_slot, key_valid,
                         caches):
            h = embed(spec, params, token[:, None], dtype)
            ctx = {"cos": None, "sin": None, "bias": None}
            h, caches = _stack_forward(spec, params, h, ctx, caches)
            logits = lm_logits(spec, params, h)[:, 0]
            return logits, caches, key_valid

        return decode_mamba

    @jax.jit
    def decode(params, token, logical_pos, write_slot, key_valid, caches):
        key_valid = key_valid.at[:, write_slot].set(True)
        cos, sin = rope_cos_sin(spec, logical_pos[:, None])
        bias = jnp.where(key_valid, 0.0, _NEG)[:, None, None, :]
        ctx = {"cos": cos, "sin": sin, "bias": bias}
        if has_sliding_layers(spec):
            ctx["cos_l"], ctx["sin_l"] = rope_cos_sin(
                spec, logical_pos[:, None], local=True
            )
            ki = jnp.arange(key_valid.shape[1])[None, :]
            ok_l = key_valid & (ki > write_slot - spec.sliding_window)
            ctx["bias_l"] = jnp.where(ok_l, 0.0, _NEG)[:, None, None, :]
        h = embed(spec, params, token[:, None], dtype, logical_pos[:, None])
        caches = [dict(c, pos=write_slot) if "k" in c else c for c in caches]
        h, caches = _stack_forward(spec, params, h, ctx, caches)
        logits = lm_logits(spec, params, h)[:, 0]
        return logits, caches, key_valid

    return decode


def greedy_generate(
    spec: ModelSpec,
    params,
    input_ids: np.ndarray,  # [B, T] right-padded
    prompt_lens: np.ndarray | None = None,  # [B]
    max_new_tokens: int = 32,
    eos_token_id: Optional[int] = None,
    dtype=jnp.bfloat16,
    max_len: Optional[int] = None,
    kv_quant: bool = False,
) -> np.ndarray:
    """Greedy decode. Returns generated tokens [B, max_new_tokens]."""
    B, T = input_ids.shape
    if prompt_lens is None:
        prompt_lens = np.full((B,), T, dtype=np.int32)
    max_len = max_len or (T + max_new_tokens)
    caches = init_kv_cache(spec, B, max_len, dtype, kv_quant)
    if (any("k" not in c for c in caches)
            and len(set(int(x) for x in np.asarray(prompt_lens))) > 1):
        # recurrent state consumes pad tokens (attention masks them) —
        # a ragged right-padded batch would corrupt short rows' state
        # (transformer.py mamba prefill is exact for un-padded prompts)
        raise ValueError(
            "ragged prompt lengths are not supported for recurrent-cache "
            "models in batch greedy_generate (pad tokens would flow "
            "through the conv/ssm state); use equal-length rows or the "
            "continuous-batching engine (exact-length prefill)")
    prefill = make_prefill_fn(spec, dtype)
    decode = make_decode_fn(spec, dtype)

    lens = jnp.asarray(prompt_lens, jnp.int32)
    logits, caches, key_valid = prefill(params, jnp.asarray(input_ids), lens, caches)
    token = jnp.argmax(logits, axis=-1)
    out = [np.asarray(token)]
    logical_pos = lens
    done = np.zeros(B, dtype=bool)
    for step in range(max_new_tokens - 1):
        logits, caches, key_valid = decode(
            params, token, logical_pos, jnp.int32(T + step), key_valid, caches
        )
        token = jnp.argmax(logits, axis=-1)
        logical_pos = logical_pos + 1
        t_np = np.asarray(token)
        out.append(t_np)
        if eos_token_id is not None:
            # HF configs may declare several stop ids (glm4, llama3)
            done |= np.isin(t_np, np.atleast_1d(eos_token_id))
            if done.all():
                break
    return np.stack(out, axis=1)


def perplexity(
    spec: ModelSpec,
    params,
    input_ids: np.ndarray,  # [N, T]
    row_mask: Optional[np.ndarray] = None,  # [N, T]
    batch_size: int = 4,
    dtype=jnp.float32,
) -> float:
    """Causal-LM perplexity over token rows (WikiText-2-style harness).

    Analog of the reference's eval wrapper (tests/eval.py); the BASELINE ppl
    delta metric runs through this.
    """
    from gptqmodel_tpu.models.transformer import forward_logits

    # params must be an ARGUMENT: closures embed arrays as HLO constants
    # (multi-GB programs; the remote compiler rejects them outright)
    @jax.jit
    def nll(params, ids, m):
        logits = forward_logits(spec, params, ids, dtype=dtype)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = ids[:, 1:]
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        mm = m[:, 1:]
        return -(ll * mm).sum(), mm.sum()

    if row_mask is None:
        row_mask = np.ones_like(input_ids, dtype=np.float32)
    total, count = 0.0, 0.0
    N = input_ids.shape[0]
    for i in range(0, N, batch_size):
        ids = jnp.asarray(input_ids[i : i + batch_size])
        m = jnp.asarray(row_mask[i : i + batch_size], jnp.float32)
        s, c = nll(params, ids, m)
        total += float(s)
        count += float(c)
    return float(np.exp(total / max(count, 1.0)))
