"""Functional JAX transformer forward for the llama lineage (+ MoE).

TPU-native replacement for the reference's reliance on HF torch modeling
code: the quantization looper and the inference engine both run THIS forward.
Design (SURVEY §7):

- params are plain nested dicts mirroring HF tensor names (loader maps
  safetensors 1:1); a linear is either ``{"weight": [out,in], "bias"?}`` or a
  packed ``ops.qlinear.QuantLinear`` — ``apply_linear`` dispatches.
- activation capture is functional: pass ``tap_paths`` and the forward
  returns the exact module inputs (replaces HookedLinear + StopForward,
  reference nn_modules/hooked_linear.py).
- MoE expert inputs are captured as row-masked token matrices: unrouted rows
  are zeroed, so Hessian accumulation ``xᵀx`` over them is exact while shapes
  stay static for XLA (replaces the reference's routed pre-hooks,
  stage_subset.py:773).
- no data-dependent control flow; KV-cache update is a dynamic_update_slice
  so prefill/decode jit once per shape.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gptqmodel_tpu.models.spec import ModelSpec
from gptqmodel_tpu.ops.qlinear import QuantLinear

Params = dict[str, Any]


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------


def get_by_path(tree: Params, path: str):
    node = tree
    for part in path.split("."):
        node = node[int(part)] if part.isdigit() and not isinstance(node, dict) else node[part]
    return node


def set_by_path(tree: Params, path: str, value):
    parts = path.split(".")
    node = tree
    for part in parts[:-1]:
        node = node[int(part)] if part.isdigit() and not isinstance(node, dict) else node[part]
    last = parts[-1]
    if last.isdigit() and not isinstance(node, dict):
        node[int(last)] = value
    else:
        node[last] = value


def apply_linear(p, x: jnp.ndarray) -> jnp.ndarray:
    """Dense HF-layout ({"weight": [out,in]}), packed QuantLinear, or Fp8Linear."""
    if isinstance(p, QuantLinear):
        from gptqmodel_tpu.ops.registry import qlinear_forward

        return qlinear_forward(p, x)
    from gptqmodel_tpu.ops.fp8 import Fp4Linear, Fp8Linear, fp4_forward, fp8_forward

    if isinstance(p, Fp8Linear):
        return fp8_forward(p, x)
    if isinstance(p, Fp4Linear):
        return fp4_forward(p, x)
    from gptqmodel_tpu.ops.bnb import Bnb4Linear, bnb4_forward

    if isinstance(p, Bnb4Linear):
        return bnb4_forward(p, x)
    from gptqmodel_tpu.ops.trellis import TrellisLinear, trellis_forward

    if isinstance(p, TrellisLinear):
        return trellis_forward(p, x)
    w = p["weight"]
    y = x @ w.T.astype(x.dtype)
    b = p.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def linear_out_features(p) -> int:
    """Static output width of any linear param form (dense dict / packed)."""
    of = getattr(p, "out_features", 0)
    if of:
        return int(of)
    return int(p["weight"].shape[0])


def layer_norm(x: jnp.ndarray, w, b, eps: float):
    """Mean-subtracting LayerNorm (opt/gpt2/cohere); w=None -> non-parametric
    (olmo's OlmoLayerNorm, modeling_olmo.py:28)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if w is not None:
        y = y * w.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def sublayer_norm(spec: "ModelSpec", npar, x: jnp.ndarray):
    """Per-spec decoder-layer norm: rms (default) | ln (cohere/starcoder2,
    mean-centered, optional bias) | ln_np (olmo, no parameters)."""
    if spec.norm_type == "ln_np":
        return layer_norm(x, None, None, spec.rms_norm_eps)
    if spec.norm_type == "ln":
        return layer_norm(x, npar["weight"], npar.get("bias"), spec.rms_norm_eps)
    if spec.norm_type == "ln1p":  # nemotron LayerNorm1P: (1+w) affine
        return layer_norm(
            x, npar["weight"] + 1.0, npar.get("bias"), spec.rms_norm_eps
        )
    return rms_norm(x, npar["weight"], spec.rms_norm_eps, spec.rms_norm_offset)


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float, offset: bool = False):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    scale = (1.0 + w.astype(jnp.float32)) if offset else w.astype(jnp.float32)
    return (normed * scale).astype(x.dtype)


def yarn_get_mscale(scale: float, mscale: float = 1.0) -> float:
    import math

    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def _yarn_inv_freq(spec: ModelSpec, dim: int) -> tuple[np.ndarray, float]:
    """YaRN NTK-by-parts inverse frequencies + cos/sin attention factor
    (HF _compute_yarn_parameters semantics; deepseek checkpoints use this)."""
    import math

    rs = spec.rope_scaling
    base = spec.rope_theta
    factor = rs["factor"]
    beta_fast = rs.get("beta_fast") or 32
    beta_slow = rs.get("beta_slow") or 1
    orig = rs.get("original_max_position_embeddings") or spec.max_position_embeddings
    attention_factor = rs.get("attention_factor")
    mscale, mscale_all = rs.get("mscale"), rs.get("mscale_all_dim")
    if attention_factor is None:
        if mscale and mscale_all:
            attention_factor = yarn_get_mscale(factor, mscale) / yarn_get_mscale(
                factor, mscale_all
            )
        else:
            attention_factor = yarn_get_mscale(factor)

    def corr_dim(num_rot):
        return (dim * math.log(orig / (num_rot * 2 * math.pi))) / (2 * math.log(base))

    lo, hi = corr_dim(beta_fast), corr_dim(beta_slow)
    if rs.get("truncate", True):  # gpt_oss ships truncate=False
        lo, hi = math.floor(lo), math.ceil(hi)
    low = max(lo, 0)
    high = min(hi, dim - 1)
    ramp = np.clip(
        (np.arange(dim // 2, dtype=np.float64) - low) / max(high - low, 1e-3), 0, 1
    )
    extrap_factor = 1.0 - ramp
    pos_freqs = base ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    inv = (1.0 / (factor * pos_freqs)) * (1 - extrap_factor) + (
        1.0 / pos_freqs
    ) * extrap_factor
    return inv.astype(np.float32), float(attention_factor)


def _rope_params(spec: ModelSpec, local: bool = False) -> tuple[np.ndarray, float]:
    """(inv_freq, cos/sin scaling). MLA models rotate only the rope slice;
    neox-lineage partial rotary (rotary_pct / partial_rotary_factor) rotates
    only the first ``spec.rotary_dim`` dims."""
    if spec.rotary_dim:
        dim = spec.rotary_dim
    else:
        dim = spec.qk_rope_head_dim if spec.mla else spec.head_dim
    if local and spec.rope_local_theta:  # gemma3: separate base, NO scaling
        theta = spec.rope_local_theta
        inv = 1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
        return inv.astype(np.float32), 1.0
    # no separate local base (gpt_oss/cohere2 hybrids): sliding layers share
    # the global rope (incl. yarn scaling)
    rs = spec.rope_scaling
    if rs and rs.get("rope_type", rs.get("type")) == "yarn":
        return _yarn_inv_freq(spec, dim)
    inv = 1.0 / spec.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    if rs and rs.get("rope_type", rs.get("type")) == "linear":
        inv = inv / rs["factor"]
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        factor = rs["factor"]
        lo = rs.get("low_freq_factor", 1.0)
        hi = rs.get("high_freq_factor", 4.0)
        orig = rs.get("original_max_position_embeddings", 8192)
        wavelen = 2 * np.pi / inv
        low_wl, high_wl = orig / lo, orig / hi
        smooth = (orig / wavelen - lo) / (hi - lo)
        scaled = np.where(
            wavelen > low_wl,
            inv / factor,
            np.where(
                wavelen < high_wl,
                inv,
                (1 - smooth) / factor * inv + smooth * inv,
            ),
        )
        inv = scaled
    return inv.astype(np.float32), 1.0


def rope_cos_sin(spec: ModelSpec, positions: jnp.ndarray, local: bool = False):
    """positions [*, T] int32 -> (cos, sin) [*, T, rope_dim] f32
    (rope_dim = head_dim, or the rope slice for MLA models)."""
    inv_np, scaling = _rope_params(spec, local=local)
    inv = jnp.asarray(inv_np)
    freqs = positions.astype(jnp.float32)[..., None] * inv[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb) * scaling, jnp.sin(emb) * scaling


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q,k [B, H, T, D]; cos/sin [B, T, D] (HF rotate-half convention)."""
    c = cos[:, None, :, :].astype(q.dtype)
    s = sin[:, None, :, :].astype(q.dtype)
    return q * c + _rotate_half(q) * s, k * c + _rotate_half(k) * s


def apply_rope_interleaved(q, k, cos, sin):
    """Pair-interleaved rope: pairs (x[2i], x[2i+1]) rotate by θ_i — the
    deepseek convention (HF apply_rotary_emb complex form, deepseek_v2
    modeling :272). cos/sin [B, T, D] concat-halves; only the first D/2
    entries are the distinct angles."""
    d = q.shape[-1]
    c = cos[..., : d // 2][:, None].astype(jnp.float32)
    s = sin[..., : d // 2][:, None].astype(jnp.float32)

    def rot(x):
        xf = x.astype(jnp.float32)
        a, b = xf[..., 0::2], xf[..., 1::2]
        out = jnp.stack([a * c - b * s, a * s + b * c], axis=-1)
        return out.reshape(x.shape).astype(x.dtype)

    return rot(q), rot(k)


def layer_is_sliding(spec: ModelSpec, i: int) -> bool:
    """gemma3-style per-layer attention kind (spec.layer_types)."""
    if spec.layer_types:
        return spec.layer_types[i] in ("sliding_attention", "chunked_attention")
    return False


def has_sliding_layers(spec: ModelSpec) -> bool:
    return any(layer_is_sliding(spec, i) for i in range(spec.num_layers))


def layer_rope_bias(spec: ModelSpec, i: int, ctx: dict):
    """Select the (cos, sin, attn_bias) for layer ``i`` from a context dict
    {cos, sin, bias[, cos_l, sin_l, bias_l]} — sliding layers (gemma3) get
    the local-rope + windowed-mask variants."""
    if spec.rope_sliding_only and not layer_is_sliding(spec, i):
        # cohere2/exaone4 hybrid: full-attention layers skip RoPE entirely
        # (modeling_cohere2.py:217, modeling_exaone4.py:227)
        return None, None, ctx["bias"]
    if spec.no_rope_layers and not spec.no_rope_layers[i]:  # smollm3/llama4
        bias = ctx["bias_l"] if layer_is_sliding(spec, i) and "bias_l" in ctx \
            else ctx["bias"]
        # llama4 NoPE temperature tuning rides in the sin slot (attention
        # applies it as a q scale when cos is None)
        return None, ctx.get("attn_temp"), bias
    if layer_is_sliding(spec, i) and "cos_l" in ctx:
        return ctx["cos_l"], ctx["sin_l"], ctx.get("bias_l", ctx["bias"])
    return ctx["cos"], ctx["sin"], ctx["bias"]


def make_causal_mask(q_len: int, kv_len: int, dtype=jnp.float32, window: int = 0,
                     chunk: int = 0):
    """Additive causal mask [1, 1, q_len, kv_len]; offset so the query block
    aligns to the END of the kv span (prefill: q_len == kv_len). ``window``:
    sliding attention; ``chunk``: llama4 chunked attention (attend within
    the same chunk only)."""
    qi = jnp.arange(q_len)[:, None] + (kv_len - q_len)
    ki = jnp.arange(kv_len)[None, :]
    ok = ki <= qi
    if window > 0:
        ok &= ki > qi - window
    if chunk > 0:
        ok &= (ki // chunk) == (qi // chunk)
    neg = jnp.asarray(jnp.finfo(dtype).min, dtype)
    return jnp.where(ok, jnp.asarray(0.0, dtype), neg)[None, None]


# --------------------------------------------------------------------------
# attention
# --------------------------------------------------------------------------


def _kv_quantize(t: jnp.ndarray):
    """Per-(batch, head, position) absmax int8 quantization of K/V vectors
    (PAPERS.md KV-cache quantization lineage): [B,H,T,D] -> (int8, scales)."""
    tf = t.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(tf), axis=-1) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(tf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def _kv_quantize_i4(t: jnp.ndarray):
    """int4 KV: absmax to [-7, 7], packed two-per-byte along D
    ([B,H,T,D] -> uint8 [B,H,T,D/2] nibbles lo=even, hi=odd; 4x less cache
    HBM than bf16)."""
    tf = t.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(tf), axis=-1) / 7.0, 1e-8)
    q = jnp.clip(jnp.round(tf / s[..., None]), -7, 7).astype(jnp.int32) + 8
    lo = q[..., 0::2]
    hi = q[..., 1::2]
    return (lo | (hi << 4)).astype(jnp.uint8), s


def _kv_dequantize_i4(packed: jnp.ndarray, s: jnp.ndarray, dtype):
    """uint8 [B,H,L,D/2] + scales [B,H,L] -> [B,H,L,D]."""
    u = packed.astype(jnp.int32)
    lo = (u & 0xF) - 8
    hi = (u >> 4) - 8
    q = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)
    return (q.astype(jnp.float32) * s[..., None]).astype(dtype)


def _tap(taps, tap_paths, path, x, mask=None):
    if taps is not None and path in tap_paths:
        taps[path] = x if mask is None else (x, mask)


def _cache_write_read(cache: dict, k, v, B: int, T: int, dtype):
    """Write current k/v [B, H, T, D] into the cache and read back the full
    span. Handles a uniform scalar write pointer (prefill / batch decode) or
    per-slot pointers (continuous batching, T == 1), and the int8/int4 KV
    layouts ("k_s"/"v_s" per-(b,h,pos) scales; int4 packs two-per-byte along
    D). Returns (k_full, v_full, cache)."""
    pos = cache["pos"]
    kv_q = "k_s" in cache
    kv_i4 = kv_q and cache["k"].dtype == jnp.uint8
    if kv_i4:
        k_store, k_sc = _kv_quantize_i4(k)
        v_store, v_sc = _kv_quantize_i4(v)
    elif kv_q:
        k_store, k_sc = _kv_quantize(k)
        v_store, v_sc = _kv_quantize(v)
    else:
        k_store, v_store = k, v
    if jnp.ndim(pos) == 0:  # uniform write pointer
        upd = lambda buf, val: jax.lax.dynamic_update_slice(
            buf, val.astype(buf.dtype), (0, 0, pos) + (0,) * (buf.ndim - 3)
        )
        cache = dict(cache, k=upd(cache["k"], k_store),
                     v=upd(cache["v"], v_store), pos=pos + T)
        if kv_q:
            cache["k_s"] = upd(cache["k_s"], k_sc)
            cache["v_s"] = upd(cache["v_s"], v_sc)
    elif T == 1:  # per-slot write positions (continuous batching)
        bidx = jnp.arange(B)
        # one (row, pos) target per row: unique + row-sorted by construction,
        # so the scatter lowers without dedup/serialization guards
        upd = lambda buf, val: buf.at[bidx, :, pos].set(
            val[:, :, 0].astype(buf.dtype),
            unique_indices=True, indices_are_sorted=True,
        )
        cache = dict(cache, k=upd(cache["k"], k_store),
                     v=upd(cache["v"], v_store), pos=pos + 1)
        if kv_q:
            cache["k_s"] = upd(cache["k_s"], k_sc)
            cache["v_s"] = upd(cache["v_s"], v_sc)
    else:  # per-slot positions, T-token block (speculative verify step):
        # advanced indices around the ":" put the advanced axes first, so
        # the value arrives as [B, T, H, ...]
        bidx = jnp.arange(B)[:, None]
        tidx = pos[:, None] + jnp.arange(T)[None, :]
        upd = lambda buf, val: buf.at[bidx, :, tidx].set(
            jnp.moveaxis(val, 2, 1).astype(buf.dtype)
        )
        cache = dict(cache, k=upd(cache["k"], k_store),
                     v=upd(cache["v"], v_store), pos=pos + T)
        if kv_q:
            cache["k_s"] = upd(cache["k_s"], k_sc)
            cache["v_s"] = upd(cache["v_s"], v_sc)
    if kv_i4:
        k = _kv_dequantize_i4(cache["k"], cache["k_s"], dtype)
        v = _kv_dequantize_i4(cache["v"], cache["v_s"], dtype)
    elif kv_q:
        k = cache["k"].astype(dtype) * cache["k_s"][..., None].astype(dtype)
        v = cache["v"].astype(dtype) * cache["v_s"][..., None].astype(dtype)
    else:
        k, v = cache["k"], cache["v"]
    return k, v, cache


class LazyCausalBias:
    """Structural prefill mask carried as INDICES instead of a materialized
    ``[B, 1, T, S]`` tensor (quadratic in context — 554 MB at B=8/T=4k f32).
    Attention consumes it through the chunked online-softmax path
    (:func:`_chunked_causal_attention`); exotic branches (differential
    attention) fall back to :meth:`materialize`.

    Mask semantics match engine.make_prefill_fn's dense construction:
    ``ok = (ki <= qi) & (ki < prompt_len) [& (ki > qi - window)]``.
    """

    def __init__(self, prompt_lens, T: int, S: int, window: int = 0):
        self.prompt_lens = prompt_lens  # [B] int32
        self.T = T
        self.S = S
        self.window = window

    def materialize(self, neg=-1e30):
        qi = jnp.arange(self.T)[:, None]
        ki = jnp.arange(self.S)[None, :]
        ok = (ki <= qi)[None] & (
            ki[None] < self.prompt_lens[:, None, None]
        )
        if self.window:
            ok = ok & (ki > qi - self.window)[None]
        return jnp.where(ok, 0.0, neg)[:, None]  # [B, 1, T, S]

    def astype(self, dtype):
        """Dense fallback for attention variants with no chunked handling
        (MLA, opt/gpt2/bloom/neox/falcon lineages do ``logits +
        attn_bias.astype(...)`` directly): materialize the [B, 1, T, S]
        bias — the pre-chunked behavior, so long prompts still work there
        (without the memory win)."""
        return self.materialize().astype(dtype)


def _chunked_causal_attention(
    spec, q, k, v, lb: LazyCausalBias, scale, rep, sinks=None, chunk=512
):
    """Flash-style prefill: scan over key chunks with a running
    (max, denom, acc) online softmax — live memory O(B·H·T·(D + chunk))
    instead of the O(T·S) logits/bias tensors. Masks are computed from
    indices inside each chunk (nothing quadratic is ever materialized).
    ``sinks`` (gpt_oss) fold into the initial carry: m0 = sink, l0 = 1
    reproduces the sink softmax denominator exactly."""
    B, Hkv = k.shape[0], k.shape[1]
    T, D = q.shape[2], q.shape[3]
    S = k.shape[2]
    ch = min(chunk, S)
    Sp = -(-S // ch) * ch
    if Sp != S:
        # ragged tail: pad K/V to the chunk multiple — the ki masks below
        # already exclude pad keys (ki >= S >= prompt_lens). Halving ch
        # until it divides S degraded to tiny chunks at non-power-of-two
        # lengths (S=1000 -> ch=8: a 125-step scan of sliver einsums).
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    nc = Sp // ch
    qg = q.reshape(B, Hkv, rep, T, D)
    qi = jnp.arange(T)[None, :]  # [1, T]
    neg = jnp.float32(-1e30)

    if sinks is not None:
        m0 = jnp.broadcast_to(
            sinks.reshape(1, Hkv, rep, 1, 1).astype(jnp.float32),
            (B, Hkv, rep, T, 1),
        )
        l0 = jnp.ones((B, Hkv, rep, T, 1), jnp.float32)
    else:
        m0 = jnp.full((B, Hkv, rep, T, 1), neg)
        l0 = jnp.zeros((B, Hkv, rep, T, 1), jnp.float32)
    acc0 = jnp.zeros((B, Hkv, rep, T, D), jnp.float32)

    def body(carry, c):
        m, l, acc = carry
        kc = jax.lax.dynamic_slice_in_dim(k, c * ch, ch, axis=2)
        vc = jax.lax.dynamic_slice_in_dim(v, c * ch, ch, axis=2)
        logits = jnp.einsum(
            "bgrqd,bgkd->bgrqk", qg, kc, preferred_element_type=jnp.float32
        ) * scale
        if spec.attn_softcap:
            logits = jnp.tanh(logits / spec.attn_softcap) * spec.attn_softcap
        ki = c * ch + jnp.arange(ch)[None, None, :]  # [1, 1, ch]
        ok = (ki <= qi[:, :, None]) & (
            ki < lb.prompt_lens[:, None, None]
        )
        if lb.window:
            ok = ok & (ki > qi[:, :, None] - lb.window)
        logits = jnp.where(ok[:, None, None], logits, neg)
        mc = jnp.max(logits, axis=-1, keepdims=True)
        mn = jnp.maximum(m, mc)
        p = jnp.exp(logits - mn)
        alpha = jnp.exp(m - mn)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bgrqk,bgkd->bgrqd", p.astype(q.dtype), vc,
            preferred_element_type=jnp.float32,
        )
        return (mn, l, acc), ()

    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(nc))
    out = acc / jnp.maximum(l, 1e-30)
    return out.reshape(B, Hkv * rep, T, D).astype(q.dtype)


def attention(
    spec: ModelSpec,
    ap: Params,
    h: jnp.ndarray,  # [B, T, hidden]
    cos,
    sin,
    attn_bias,  # additive [*, *, T, KV], a LazyCausalBias, or None
    cache: Optional[dict] = None,  # {"k","v": [B, Hkv, L, D], "pos": int32}
    prefix: str = "self_attn",
    taps=None,
    tap_paths=frozenset(),
):
    B, T, _ = h.shape
    nh, nkv, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    if spec.layer_kv_heads and "k_proj" in ap:
        # decilm/nemotron-nas per-layer GQA: derive kv heads from the
        # layer's own projection shape (robust in every caller — forward,
        # looper replay, serving — without spec plumbing)
        nkv = linear_out_features(ap["k_proj"]) // hd

    if "qkv_proj" in ap:  # phi3-style fused projection
        _tap(taps, tap_paths, f"{prefix}.qkv_proj", h)
        qkv = apply_linear(ap["qkv_proj"], h)
        if spec.qkv_layout == "grouped":
            # internlm2 wqkv: [nkv, q_per_group + 2, hd] (k, v = last two)
            grp = nh // nkv
            qkv = qkv.reshape(B, T, nkv, grp + 2, hd)
            qf = qkv[:, :, :, :grp].reshape(B, T, nh * hd)
            kf = qkv[:, :, :, grp].reshape(B, T, nkv * hd)
            vf = qkv[:, :, :, grp + 1].reshape(B, T, nkv * hd)
        else:
            qf, kf, vf = jnp.split(
                qkv, [nh * hd, nh * hd + nkv * hd], axis=-1
            )
    else:
        _tap(taps, tap_paths, f"{prefix}.q_proj", h)
        _tap(taps, tap_paths, f"{prefix}.k_proj", h)
        _tap(taps, tap_paths, f"{prefix}.v_proj", h)
        qf = apply_linear(ap["q_proj"], h)
        kf = apply_linear(ap["k_proj"], h)
        vf = apply_linear(ap["v_proj"], h)
    out_gate = None
    if spec.attn_output_gate:  # qwen3_next: q_proj = per-head [q | gate]
        qg = qf.reshape(B, T, nh, 2 * hd)
        qf = qg[..., :hd].reshape(B, T, nh * hd)
        out_gate = qg[..., hd:].reshape(B, T, nh * hd)
    if spec.key_multiplier:  # falcon_h1 mup (modeling_falcon_h1.py:360)
        kf = kf * spec.key_multiplier
    if spec.clip_qkv:  # olmo (modeling_olmo.py:174)
        qf = jnp.clip(qf, -spec.clip_qkv, spec.clip_qkv)
        kf = jnp.clip(kf, -spec.clip_qkv, spec.clip_qkv)
        vf = jnp.clip(vf, -spec.clip_qkv, spec.clip_qkv)
    if spec.qk_norm_wide:  # olmo2/olmoe: RMSNorm over the full projection
        qf = rms_norm(qf, ap["q_norm"]["weight"], spec.rms_norm_eps)
        kf = rms_norm(kf, ap["k_norm"]["weight"], spec.rms_norm_eps)
    q = qf.reshape(B, T, nh, hd)
    k = kf.reshape(B, T, nkv, hd)
    v = vf.reshape(B, T, nkv, hd)

    if spec.qk_norm:  # qwen3/gemma3: per-head RMSNorm before RoPE
        qn = (ap.get("q_norm") or ap.get("query_layernorm")
              or ap["q_layernorm"])  # hunyuan / lfm2 naming
        kn = (ap.get("k_norm") or ap.get("key_layernorm")
              or ap["k_layernorm"])
        q = rms_norm(q, qn["weight"], spec.rms_norm_eps, spec.rms_norm_offset)
        k = rms_norm(k, kn["weight"], spec.rms_norm_eps, spec.rms_norm_offset)
    if spec.qk_norm_ln:  # cohere use_qk_norm: per-head mean-centered LN
        q = layer_norm(q, ap["q_norm"]["weight"], None, spec.rms_norm_eps)
        k = layer_norm(k, ap["k_norm"]["weight"], None, spec.rms_norm_eps)

    q = q.transpose(0, 2, 1, 3)  # [B, H, T, D]
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if cos is not None:
        # full rope by default; cohere = interleaved, glm = partial(0.5)
        # interleaved — _apply_partial_rope folds all three conventions
        q, k = _apply_partial_rope(spec, q, k, cos, sin)
        if spec.qk_norm_l2:  # llama4: weightless RMS norm AFTER rope
            q = q * jax.lax.rsqrt(
                jnp.mean(q.astype(jnp.float32) ** 2, -1, keepdims=True)
                + spec.rms_norm_eps
            ).astype(q.dtype)
            k = k * jax.lax.rsqrt(
                jnp.mean(k.astype(jnp.float32) ** 2, -1, keepdims=True)
                + spec.rms_norm_eps
            ).astype(k.dtype)
    elif sin is not None:  # llama4 NoPE temperature (layer_rope_bias)
        q = q * sin[:, None, :, None].astype(q.dtype)

    if cache is not None:
        k, v, cache = _cache_write_read(cache, k, v, B, T, q.dtype)

    scale = spec.attn_scale or (
        spec.query_pre_attn_scalar**-0.5 if spec.query_pre_attn_scalar else hd**-0.5
    )
    rep = nh // k.shape[1]
    S = k.shape[2]
    # gpt_oss attention sinks: one learned extra softmax logit per head,
    # dropped after normalization (modeling_gpt_oss.py:258-264)
    sinks = ap["sinks"].astype(jnp.float32) if "sinks" in ap else None

    def _sink_softmax(logits, sink):  # logits [..., T, S], sink [...] scalar/hd
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), sink)
        e = jnp.exp(logits - m)
        denom = jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(sink - m)
        return e / denom

    if isinstance(attn_bias, LazyCausalBias):
        if "lambda_q1" not in ap:
            out = _chunked_causal_attention(
                spec, q, k, v, attn_bias, scale, rep, sinks=sinks
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, T, nh * hd)
            if out_gate is not None:
                out = out * jax.nn.sigmoid(
                    out_gate.astype(jnp.float32)
                ).astype(out.dtype)
            if "attn_sub_norm" in ap:
                out = rms_norm(
                    out, ap["attn_sub_norm"]["weight"], spec.rms_norm_eps
                )
            oname = "o_proj" if "o_proj" in ap else "out_proj"
            _tap(taps, tap_paths, f"{prefix}.{oname}", out)
            return apply_linear(ap[oname], out), cache
        attn_bias = attn_bias.materialize()  # exotic branch: dense fallback

    if "lambda_q1" in ap:  # diffllama differential attention
        out = _diff_attention(spec, ap, q, k, v, attn_bias, scale, rep)
    elif rep > 1:
        # GQA without materializing repeated K/V: fold the query-group dim
        # into the einsum (saves 2·rep× the KV bytes in copies — dominant
        # non-matmul cost of decode on big GQA models)
        qg = q.reshape(B, k.shape[1], rep, T, hd)
        logits = jnp.einsum(
            "bgrqd,bgkd->bgrqk", qg, k, preferred_element_type=jnp.float32
        ) * scale
        if spec.attn_softcap:
            logits = jnp.tanh(logits / spec.attn_softcap) * spec.attn_softcap
        if attn_bias is not None:
            bias = attn_bias.astype(logits.dtype)
            # [B|1, 1, T, S] -> broadcast over (g, r)
            logits = logits + bias[:, :, None]
        if sinks is not None:
            sk = sinks.reshape(1, k.shape[1], rep, 1, 1)
            probs = _sink_softmax(logits, sk).astype(q.dtype)
        else:
            probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", probs, v.astype(q.dtype))
        out = out.reshape(B, nh, T, hd)
    else:
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if spec.attn_softcap:
            logits = jnp.tanh(logits / spec.attn_softcap) * spec.attn_softcap
        if attn_bias is not None:
            logits = logits + attn_bias.astype(logits.dtype)
        if sinks is not None:
            sk = sinks.reshape(1, nh, 1, 1)
            probs = _sink_softmax(logits, sk).astype(q.dtype)
        else:
            probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(q.dtype))
    out = out.transpose(0, 2, 1, 3).reshape(B, T, nh * hd)

    if out_gate is not None:  # qwen3_next sigmoid output gate
        out = out * jax.nn.sigmoid(out_gate.astype(jnp.float32)).astype(out.dtype)
    if "attn_sub_norm" in ap:  # bitnet sub-LN before o_proj
        # (modeling_bitnet.py:222 "diff with Llama")
        out = rms_norm(out, ap["attn_sub_norm"]["weight"], spec.rms_norm_eps)
    oname = "o_proj" if "o_proj" in ap else "out_proj"  # lfm2 naming
    _tap(taps, tap_paths, f"{prefix}.{oname}", out)
    return apply_linear(ap[oname], out), cache


def _diff_attention(spec: ModelSpec, ap: Params, q, k, v, attn_bias, scale, rep):
    """DiffLlama differential attention (modeling_diffllama.py:159-220):
    two softmax maps share one QK pass — v is head-halved and
    feature-doubled, the two head-group outputs are subtracted with
    lambda_full = exp(lq1·lk1) − exp(lq2·lk2) + lambda_init(layer), then a
    parameter-free RMSNorm(2·hd) and a (1 − lambda_init) scale. lambda_init
    is the loader-derived runtime param ``_lam_init``."""
    B, nh, T, hd = q.shape
    kx = jnp.repeat(k, rep, axis=1) if rep > 1 else k
    vx = jnp.repeat(v, rep, axis=1) if rep > 1 else v
    v2 = jnp.concatenate(jnp.split(vx, 2, axis=1), axis=-1)  # [B, nh/2, S, 2hd]
    v2 = jnp.concatenate([v2, v2], axis=1)  # [B, nh, S, 2hd]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, kx, preferred_element_type=jnp.float32
    ) * scale
    if attn_bias is not None:
        logits = logits + attn_bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v2.astype(q.dtype))
    o1, o2 = jnp.split(out, 2, axis=1)  # head groups
    lam1 = jnp.exp(jnp.sum(
        ap["lambda_q1"].astype(jnp.float32) * ap["lambda_k1"].astype(jnp.float32)
    )).astype(q.dtype)
    lam2 = jnp.exp(jnp.sum(
        ap["lambda_q2"].astype(jnp.float32) * ap["lambda_k2"].astype(jnp.float32)
    )).astype(q.dtype)
    lam_init = jnp.asarray(ap["_lam_init"], q.dtype)
    lam_full = lam1 - lam2 + lam_init
    out = o1 - lam_full * o2  # [B, nh/2, T, 2hd]
    of = out.astype(jnp.float32)
    out = (of * jax.lax.rsqrt(
        jnp.mean(of * of, axis=-1, keepdims=True) + spec.rms_norm_eps
    )).astype(q.dtype)
    return (1.0 - lam_init) * out  # reshaped by the caller: nh/2 * 2hd = nh*hd


def mla_attention(
    spec: ModelSpec,
    ap: Params,
    h: jnp.ndarray,  # [B, T, hidden]
    cos,
    sin,
    attn_bias,
    cache: Optional[dict] = None,
    prefix: str = "self_attn",
    taps=None,
    tap_paths=frozenset(),
):
    """DeepSeek multi-head latent attention (HF DeepseekV2Attention,
    modeling_deepseek_v2.py:288): low-rank q (full) or direct q (lite),
    compressed kv through kv_a/kv_b with a shared rope'd k_pe, per-head
    k = [k_nope | k_pe], separate v_head_dim.

    Cache stores the EXPANDED per-head k/v (k: qk dim, v: v_head_dim) —
    correct and simple; the latent-cache absorbed-matmul formulation
    (cache only kv_lora_rank + rope per token) is a planned decode
    optimization."""
    B, T, _ = h.shape
    nh = spec.num_heads
    nope, rope = spec.qk_nope_head_dim, spec.qk_rope_head_dim
    qk_dim = nope + rope
    vd = spec.v_head_dim

    if "q_proj" in ap:  # lite: no q compression
        _tap(taps, tap_paths, f"{prefix}.q_proj", h)
        q = apply_linear(ap["q_proj"], h)
    else:
        _tap(taps, tap_paths, f"{prefix}.q_a_proj", h)
        qa = apply_linear(ap["q_a_proj"], h)
        qa = rms_norm(qa, ap["q_a_layernorm"]["weight"], spec.rms_norm_eps)
        _tap(taps, tap_paths, f"{prefix}.q_b_proj", qa)
        q = apply_linear(ap["q_b_proj"], qa)
    if spec.mla_scale_q_lora:  # longcat lora mup (modeling :368-371)
        q = q * spec.mla_scale_q_lora
    q = q.reshape(B, T, nh, qk_dim).transpose(0, 2, 1, 3)
    q_nope, q_pe = q[..., :nope], q[..., nope:]

    _tap(taps, tap_paths, f"{prefix}.kv_a_proj_with_mqa", h)
    ckv = apply_linear(ap["kv_a_proj_with_mqa"], h)
    c_kv, k_pe = ckv[..., : spec.kv_lora_rank], ckv[..., spec.kv_lora_rank :]
    c_kv = rms_norm(c_kv, ap["kv_a_layernorm"]["weight"], spec.rms_norm_eps)
    if spec.mla_scale_kv_lora:  # longcat lora mup on the latent
        c_kv = c_kv * spec.mla_scale_kv_lora
    _tap(taps, tap_paths, f"{prefix}.kv_b_proj", c_kv)
    kv = apply_linear(ap["kv_b_proj"], c_kv)
    kv = kv.reshape(B, T, nh, nope + vd).transpose(0, 2, 1, 3)
    k_nope, v = kv[..., :nope], kv[..., nope:]

    k_pe = k_pe[:, None]  # [B, 1, T, rope] — shared across heads (mqa part)
    if spec.rope_interleave:
        q_pe, k_pe = apply_rope_interleaved(q_pe, k_pe, cos, sin)
    else:
        q_pe, k_pe = apply_rope(q_pe, k_pe, cos, sin)
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe, (B, nh, T, rope))], axis=-1
    )
    q = jnp.concatenate([q_nope, q_pe], axis=-1)

    if cache is not None:
        k, v, cache = _cache_write_read(cache, k, v, B, T, q.dtype)

    scale = qk_dim**-0.5
    rs = spec.rope_scaling
    if rs and rs.get("rope_type", rs.get("type")) == "yarn" and rs.get("mscale_all_dim"):
        m = yarn_get_mscale(rs["factor"], rs["mscale_all_dim"])
        scale = scale * m * m
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k.astype(q.dtype), preferred_element_type=jnp.float32
    ) * scale
    if attn_bias is not None:
        logits = logits + attn_bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(q.dtype))
    out = out.transpose(0, 2, 1, 3).reshape(B, T, nh * vd)
    oname = "o_proj" if "o_proj" in ap else "out_proj"  # lfm2 naming
    _tap(taps, tap_paths, f"{prefix}.{oname}", out)
    return apply_linear(ap[oname], out), cache


# --------------------------------------------------------------------------
# MLP (dense + MoE)
# --------------------------------------------------------------------------


def _act(name: str):
    return {
        "silu": jax.nn.silu,
        # HF ACT2FN["gelu"] is the exact erf form (GELUActivation); the tanh
        # approximation is the separate gelu_new/gelu_pytorch_tanh entries
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
        "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
        "relu": jax.nn.relu,
        "relu2": lambda x: jnp.square(jax.nn.relu(x)),  # nemotron/persimmon
    }[name]


def _xielu(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Apertus xIELU activation with learnable alpha_p/alpha_n (HF
    activations.py XIELUActivation._xielu_python; beta/eps are persisted
    buffers alongside the two parameters)."""
    xf = x.astype(jnp.float32)
    beta = jnp.asarray(p.get("beta", 0.5), jnp.float32)
    eps = jnp.asarray(p.get("eps", -1e-6), jnp.float32)
    alpha_p = jax.nn.softplus(jnp.asarray(p["alpha_p"], jnp.float32))
    alpha_n = beta + jax.nn.softplus(jnp.asarray(p["alpha_n"], jnp.float32))
    y = jnp.where(
        xf > 0,
        alpha_p * xf * xf + beta * xf,
        (jnp.expm1(jnp.minimum(xf, eps)) - xf) * alpha_n + beta * xf,
    )
    return y.astype(x.dtype)


def _glu(spec: ModelSpec, g: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """act(g)*u, or gpt_oss clamped GLU (modeling_gpt_oss.py:117-135)."""
    if spec.glu_clamp_limit:
        lim = spec.glu_clamp_limit
        g = jnp.minimum(g, lim)
        u = jnp.clip(u, -lim, lim)
        return (u + 1.0) * (g * jax.nn.sigmoid(spec.glu_alpha * g))
    return _act(spec.hidden_act)(g) * u


def gated_mlp(
    spec: ModelSpec,
    mp: Params,
    h: jnp.ndarray,
    prefix: str = "mlp",
    taps=None,
    tap_paths=frozenset(),
    row_mask=None,
):
    if "gate_up_proj" in mp:  # phi3-style fused projection
        if taps is None and isinstance(mp["gate_up_proj"], QuantLinear) \
                and isinstance(mp.get("down_proj"), QuantLinear):
            from gptqmodel_tpu.ops.registry import qmlp_forward

            y = qmlp_forward(
                mp["gate_up_proj"], mp["down_proj"], h, spec.hidden_act
            )
            if y is not None:  # single fused MLP kernel (decode fast path)
                return y
        _tap(taps, tap_paths, f"{prefix}.gate_up_proj", h, row_mask)
        gu = apply_linear(mp["gate_up_proj"], h)
        g, u = jnp.split(gu, 2, axis=-1)
    elif "c_fc" in mp:  # starcoder2 plain (non-gated) MLP
        _tap(taps, tap_paths, f"{prefix}.c_fc", h, row_mask)
        inner = _act(spec.hidden_act)(apply_linear(mp["c_fc"], h))
        _tap(taps, tap_paths, f"{prefix}.c_proj", inner, row_mask)
        return apply_linear(mp["c_proj"], inner)
    elif "up_proj" in mp and "gate_proj" not in mp:  # nemotron/arcee up/down
        _tap(taps, tap_paths, f"{prefix}.up_proj", h, row_mask)
        pre = apply_linear(mp["up_proj"], h)
        if spec.hidden_act == "xielu":  # apertus learnable xIELU
            inner = _xielu(pre, mp["act_fn"])
        else:
            inner = _act(spec.hidden_act)(pre)
        _tap(taps, tap_paths, f"{prefix}.down_proj", inner, row_mask)
        return apply_linear(mp["down_proj"], inner)
    elif "w1" in mp:  # mixtral expert naming: w1=gate, w3=up, w2=down
        _tap(taps, tap_paths, f"{prefix}.w1", h, row_mask)
        _tap(taps, tap_paths, f"{prefix}.w3", h, row_mask)
        g = apply_linear(mp["w1"], h)
        u = apply_linear(mp["w3"], h)
        inner = _glu(spec, g, u)
        _tap(taps, tap_paths, f"{prefix}.w2", inner, row_mask)
        return apply_linear(mp["w2"], inner)
    else:
        _tap(taps, tap_paths, f"{prefix}.gate_proj", h, row_mask)
        _tap(taps, tap_paths, f"{prefix}.up_proj", h, row_mask)
        g = apply_linear(mp["gate_proj"], h)
        u = apply_linear(mp["up_proj"], h)
    inner = _glu(spec, g, u)
    if "ffn_sub_norm" in mp:  # bitnet sub-LN before down_proj
        inner = rms_norm(inner, mp["ffn_sub_norm"]["weight"], spec.rms_norm_eps)
    _tap(taps, tap_paths, f"{prefix}.down_proj", inner, row_mask)
    return apply_linear(mp["down_proj"], inner)


def _moe_dequant_stacked(st, e):
    """Dequantize ONE stacked expert [in, out] to bf16 (jittable, fori-safe)."""
    from gptqmodel_tpu.ops.pack import rt_row_permutation, unpack_qweight_jnp

    q = unpack_qweight_jnp(st.qweight[e], st.bits)  # [in, out]
    if getattr(st, "rt", False):  # whole-K rt rows -> logical order
        import numpy as _np

        perm = rt_row_permutation(st.in_features, st.bits, st.in_features)
        q = q[jnp.asarray(_np.argsort(perm))]
    G = st.G
    g = st.in_features // G
    sc = st.scales[e][:G].astype(jnp.float32)  # [G, out]
    wd = (q.astype(jnp.float32).reshape(G, g, -1) - st.zero_const) * sc[:, None, :]
    return wd.reshape(st.in_features, -1).astype(jnp.bfloat16)


def _moe_packed_dense_fallback(spec: ModelSpec, sq: dict, x, top_w, top_i):
    """Prefill-size path for packed stacked experts: the qmoe kernel's VMEM
    blocks scale with token count (decode-shaped by design, ops/pallas_qmoe),
    so large batches fori over experts dequantizing ONE expert at a time —
    memory-bounded, compute-rich like prefill itself."""
    N, D = x.shape
    E = (sq.get("gateup") or sq["gate"]).qweight.shape[0]
    w_full = jnp.zeros((N, E), jnp.float32)
    # ADD, not set: duplicate expert ids per row must sum like the ragged
    # paths do — EP's masked remote picks alias expert 0 with w=0, and a
    # .set would let the 0 overwrite a real expert-0 weight (r4 bug found
    # by test_ep_packed_matches_single_device once rt routed EP here)
    w_full = jax.vmap(lambda w, i, row: row.at[i].add(w))(
        top_w.astype(jnp.float32), top_i, w_full
    )
    xb = x.astype(jnp.bfloat16)
    act = _act(spec.hidden_act)

    def body(e, out):
        if "gateup" in sq:
            guw = _moe_dequant_stacked(sq["gateup"], e)
            F = sq["gateup"].out_features // 2
            gw, uw = guw[:, :F], guw[:, F:]
        else:
            gw = _moe_dequant_stacked(sq["gate"], e)
            uw = _moe_dequant_stacked(sq["up"], e)
        dw = _moe_dequant_stacked(sq["down"], e)
        we = w_full[:, e]
        xe = xb * we[:, None].astype(jnp.bfloat16) if spec.moe_input_scaled else xb
        inner = (act(xe @ gw) * (xe @ uw)).astype(jnp.bfloat16)
        y = (inner @ dw).astype(jnp.float32)
        scale = (we > 0).astype(jnp.float32) if spec.moe_input_scaled else we
        return out + y * scale[:, None]

    out = jax.lax.fori_loop(0, E, body, jnp.zeros((N, D), jnp.float32))
    return out.astype(x.dtype)


# token-count bound for the decode-shaped qmoe kernel (VMEM blocks scale
# with slot-padded rows); larger dispatches use the dense-fallback above
_QMOE_MAX_TOKENS = 1024


def _moe_ragged_apply_q(spec: ModelSpec, sq: dict, x, top_w, top_i, bm: int = 8):
    """PACKED ragged expert dispatch (ops/pallas_qmoe): tokens sorted by
    expert, jit-safe slot plan, one grouped dequant-GEMM kernel per
    projection — only routed experts' packed bytes leave HBM."""
    from gptqmodel_tpu.ops.pallas_qmoe import plan_slots_jit, qmoe_forward_sorted
    from gptqmodel_tpu.ops.registry import get_backend

    interpret = get_backend() == "pallas_interpret"
    N, D = x.shape
    K = top_i.shape[1]
    M = N * K
    gate, up, down = sq.get("gate"), sq.get("up"), sq["down"]
    E = (sq.get("gateup") or gate).qweight.shape[0]
    flat_e = top_i.reshape(-1)
    import os

    gu = sq.get("gateup")
    # end-to-end MoE layer kernel: one dynamic-trip instance does the
    # one-hot gather, expert MLP and weighted combine — the [S*bm, D] slot
    # buffers never touch HBM and empty slots never execute (session Z:
    # ~2.5 us per empty grid step). The SORT-FREE plan (plan_rows_jit)
    # places unsorted rows directly, so the per-step argsort disappears
    # too. Prefill-size dispatches raise bm (more rows per expert slot,
    # better MXU row utilization) instead of falling back to the dense
    # all-expert loop (E/topk x FLOP waste). GPTQ_TPU_QMOE_E2E=0 reverts.
    if (
        gu is not None
        and os.environ.get("GPTQ_TPU_QMOE_E2E", "1") != "0"
        and os.environ.get("GPTQ_TPU_QMOE_FUSED", "1") != "0"
        and not spec.moe_input_scaled
    ):
        from gptqmodel_tpu.ops.pallas_qmoe import (
            plan_rows_jit,
            qmoe_e2e_supported,
            qmoe_mlp_forward_e2e,
        )

        # token-chunked: routing is per-token, so slicing tokens through
        # the kernel is EXACT — large prefills stay on the e2e path (the
        # resident x/out buffers scale with the chunk, not N) instead of
        # the dense all-expert fallback and its E/topk FLOP waste
        NC = int(os.environ.get("GPTQ_TPU_QMOE_CHUNK", "512"))
        nch = -(-N // NC)
        n_eff = N if nch == 1 else NC
        m_eff = n_eff * K
        # rows per slot: larger batches put many rows on each routed
        # expert — bigger bm halves the slot count (the per-slot cost is
        # MXU weight-ingest, sessions Z5-Z9) and feeds the MXU more rows
        bm_e = 8 if m_eff <= 128 else (16 if m_eff <= 1024 else 32)
        if qmoe_e2e_supported(
            bits=gu.bits, D=gu.in_features, F=gu.out_features // 2,
            G_gu=gu.G, G_d=down.G, N=n_eff, bm=bm_e, act=spec.hidden_act,
        ):
            outs = []
            for n0 in range(0, N, NC):
                n1 = min(n0 + NC, N)
                mC = (n1 - n0) * K
                fe = top_i[n0:n1].reshape(-1)
                S_e = -(-mC // bm_e) + min(E, mC)
                ids, counts, row_pos = plan_rows_jit(fe, E, bm_e, S_e)
                tok_flat = jnp.arange(mC, dtype=jnp.int32) // K
                w_flat = top_w[n0:n1].reshape(-1).astype(jnp.float32)
                outs.append(qmoe_mlp_forward_e2e(
                    x[n0:n1], row_pos, tok_flat, w_flat, ids, counts,
                    gu, down, act=spec.hidden_act, bm=bm_e,
                    interpret=interpret,
                ))
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
            return out.astype(x.dtype)
    if any(s is not None and getattr(s, "rt", False)
           for s in (gu, gate, up, down)):
        # rt-packed stacked weights serve the e2e kernel only; the slot-grid
        # kernels below expect the interchange layout — correctness fallback
        # for geometries the e2e eligibility check rejects (rare)
        return _moe_packed_dense_fallback(spec, sq, x, top_w, top_i)
    if M > _QMOE_MAX_TOKENS:  # prefill-size: slot-grid VMEM would blow up
        return _moe_packed_dense_fallback(spec, sq, x, top_w, top_i)
    S = -(-M // bm) + min(E, M)  # static slot bound (aligned layout)
    M_pad = S * bm
    order = jnp.argsort(flat_e, stable=True)
    tok = order // K
    ids, counts, pos = plan_slots_jit(flat_e[order], E, bm, S)
    w = top_w.reshape(-1)[order].astype(jnp.float32)
    # bf16 intermediates halve the slot-padded HBM round-trips — measured
    # 7.06 -> 6.76 ms/step on the 30B MoE bench with the fused gate|up form
    # (same precision class as the reference CUDA kernels' half outputs);
    # GPTQ_TPU_QMOE_BF16=0 reverts to f32 intermediates
    bf = (
        jnp.float32
        if os.environ.get("GPTQ_TPU_QMOE_BF16", "1") == "0"
        else jnp.bfloat16
    )
    x_rows = x[tok].astype(jnp.float32)
    if spec.moe_input_scaled:  # llama4: weight scales the expert INPUT
        x_rows = x_rows * w[:, None]
    xs = jnp.zeros((M_pad, D), jnp.bfloat16).at[pos].set(
        x_rows.astype(jnp.bfloat16)
    )
    # fused slot-MLP kernel: gate|up + act·mul + down in ONE launch — the
    # slot-padded intermediates never touch HBM (the bulk of the ~10%
    # traffic gap in BENCH_MOE_r02); GPTQ_TPU_QMOE_FUSED=0 reverts
    if (
        gu is not None
        and os.environ.get("GPTQ_TPU_QMOE_FUSED", "1") != "0"
        and not spec.moe_input_scaled
    ):
        from gptqmodel_tpu.ops.pallas_qmoe import (
            qmoe_mlp_forward_sorted,
            qmoe_mlp_supported,
        )

        if qmoe_mlp_supported(
            bits=gu.bits, D=gu.in_features, F=gu.out_features // 2,
            G_gu=gu.G, G_d=down.G, M_pad=M_pad, act=spec.hidden_act,
        ):
            y = qmoe_mlp_forward_sorted(
                xs, ids, counts, gu, down, act=spec.hidden_act, bm=bm,
                interpret=interpret, out_dtype=bf,
            )
            out = jnp.zeros((N, D), jnp.float32).at[tok].add(
                y[pos].astype(jnp.float32) * w[:, None]
            )
            return out.astype(x.dtype)
    if gu is not None:  # fused: one kernel + one xs stream for gate AND up
        both = qmoe_forward_sorted(xs, ids, counts, gu, bm=bm,
                                   interpret=interpret, out_dtype=bf)
        F = gu.out_features // 2
        g, u = both[:, :F], both[:, F:]
    else:
        g = qmoe_forward_sorted(xs, ids, counts, gate, bm=bm,
                                interpret=interpret, out_dtype=bf)
        u = qmoe_forward_sorted(xs, ids, counts, up, bm=bm,
                                interpret=interpret, out_dtype=bf)
    inner = (
        _act(spec.hidden_act)(g.astype(jnp.float32)) * u.astype(jnp.float32)
    ).astype(jnp.bfloat16)  # kernel input is always bf16
    y = qmoe_forward_sorted(inner, ids, counts, down, bm=bm,
                            interpret=interpret, out_dtype=bf)
    scale = jnp.ones_like(w) if spec.moe_input_scaled else w
    out = jnp.zeros((N, D), jnp.float32).at[tok].add(
        y[pos].astype(jnp.float32) * scale[:, None]
    )
    return out.astype(x.dtype)


def _moe_stacked_dispatch(spec: ModelSpec, mp, x, top_w, top_i):
    """Route stacked-expert dispatch through EP (parallel/expert.py) when the
    registry's expert-parallel context is set; single-device ragged apply
    otherwise. Callers have already checked a stacked form is present."""
    from gptqmodel_tpu.ops.registry import expert_parallel

    packed = "experts_stacked_q" in mp
    st = mp["experts_stacked_q"] if packed else mp["experts_stacked"]
    epc = expert_parallel()
    if epc is not None:
        from gptqmodel_tpu.parallel.expert import moe_forward_ep

        return moe_forward_ep(spec, st, x, top_w, top_i, epc[0], epc[1], packed)
    fn = _moe_ragged_apply_q if packed else _moe_ragged_apply
    return fn(spec, st, x, top_w, top_i)


def _moe_ragged_apply(spec: ModelSpec, stacked: dict, x, top_w, top_i):
    """Ragged/gmm expert dispatch: sort tokens by expert, one
    ``jax.lax.ragged_dot`` per projection over [E, in, out] stacked weights
    (see optimize.stack_moe_experts). Each expert computes only its routed
    rows — the E×-waste of the dense formulation disappears."""
    N, D = x.shape
    K = top_i.shape[1]
    E = stacked["gate"].shape[0]
    flat_e = top_i.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    tok = order // K
    w = top_w.reshape(-1)[order].astype(x.dtype)
    xs = x[tok]
    if spec.moe_input_scaled:  # llama4: weight scales the expert INPUT
        xs = xs * w[:, None]
        w = jnp.ones_like(w)
    gs = jnp.bincount(flat_e, length=E).astype(jnp.int32)
    g = jax.lax.ragged_dot(xs, stacked["gate"].astype(x.dtype), gs)
    u = jax.lax.ragged_dot(xs, stacked["up"].astype(x.dtype), gs)
    y = jax.lax.ragged_dot(_glu(spec, g, u), stacked["down"].astype(x.dtype), gs)
    return jnp.zeros_like(x).at[tok].add(y * w[:, None])


def _topk(x: jnp.ndarray, k: int):
    """``jax.lax.top_k`` replacement for routing-size k: k rounds of
    argmax + iota-mask. lax.top_k lowers to a per-row SORT on TPU — at
    decode shapes the sort costs more than the whole routed-expert MLP
    (session Z follow-up: removing the dispatch argsort alone was ~1
    ms/step on the 30B MoE bench). Identical values/indices incl. the
    first-occurrence tie order. Falls back to lax.top_k for large k."""
    import os

    if k > 16 or os.environ.get("GPTQ_TPU_ITER_TOPK", "0") != "1":
        # measured on the 30B MoE bench: the argmax rounds LOSE to
        # lax.top_k end-to-end (4.63 vs 3.93 ms/step) — XLA's sort is not
        # the bottleneck once the dispatch argsort is gone; kept opt-in
        # as a negative result
        return jax.lax.top_k(x, k)
    E = x.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    cur = x
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(cur, axis=-1)
        vals.append(jnp.max(cur, axis=-1))
        idxs.append(i.astype(jnp.int32))
        cur = jnp.where(cols == i[..., None], -jnp.inf, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def _sparsemixer_route(scores: jnp.ndarray, jitter_eps: float):
    """PhiMoE sparsemixer, INFERENCE path (modeling_phimoe.py:605): pick the
    top expert, softmax over the jitter-masked gates for its weight, mask it
    to -inf, repeat for the second expert."""

    def one(sc, base):
        m, idx = jnp.max(sc, axis=-1, keepdims=True), jnp.argmax(sc, axis=-1)
        factor = jnp.maximum(jnp.abs(base), m)
        masked = jnp.where((m - base) / factor > 2 * jitter_eps, -jnp.inf, sc)
        p = jax.nn.softmax(masked, axis=-1)
        w = jnp.take_along_axis(p, idx[:, None], axis=-1)
        return w[:, 0], idx.astype(jnp.int32)

    w1, e1 = one(scores, scores)
    scores2 = scores.at[jnp.arange(scores.shape[0]), e1].set(-jnp.inf)
    w2, e2 = one(scores2, scores)
    return jnp.stack([w1, w2], axis=-1), jnp.stack([e1, e2], axis=-1)


def moe_mlp(
    spec: ModelSpec,
    mp: Params,
    h: jnp.ndarray,  # [B, T, hidden]
    prefix: str = "mlp",
    taps=None,
    tap_paths=frozenset(),
):
    """Top-k routed experts (qwen3_moe/mixtral layout).

    Dense formulation: every expert runs on all tokens with routing weights
    (zero for unrouted) — static shapes, exact outputs. Expert taps carry
    (row-masked tokens, routing mask) so Hessians only see routed tokens.
    Efficient ragged/gmm dispatch is an inference-path optimization
    (ops/pallas); quantization calibration wants full coverage telemetry
    anyway (reference stage_subset.py:948 coverage policy).
    """
    B, T, D = h.shape
    x = h.reshape(B * T, D)
    router = mp["gate"] if "gate" in mp else mp["router"]
    if "wg" in router:  # hunyuan_v1_moe nested gate.wg (fp32 Linear)
        router = router["wg"]
        logits = apply_linear(router, x.astype(jnp.float32))
    else:
        logits = apply_linear(router, x).astype(jnp.float32)
    if spec.moe_scoring == "sparsemixer":  # phimoe inference routing
        top_w, top_i = _sparsemixer_route(logits, spec.router_jitter)
    elif spec.moe_scoring == "topk_softmax":  # gpt_oss: topk THEN softmax
        top_v, top_i = _topk(logits, spec.num_experts_per_tok)
        top_w = jax.nn.softmax(top_v, axis=-1)
    elif spec.moe_scoring == "llama4":  # sigmoid of topk, scales the INPUT
        top_v, top_i = _topk(logits, spec.num_experts_per_tok)
        top_w = jax.nn.sigmoid(top_v)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
        top_w, top_i = _topk(probs, spec.num_experts_per_tok)
        if spec.norm_topk_prob:
            top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

    if "experts_stacked_q" in mp and taps is None:  # packed ragged path
        out = _moe_stacked_dispatch(spec, mp, x, top_w, top_i)
        if "shared_experts" in mp:
            out = out + gated_mlp(spec, mp["shared_experts"], x)
        if "shared_expert" in mp:
            se = gated_mlp(spec, mp["shared_expert"], x)
            if "shared_expert_gate" in mp:  # qwen2_moe sigmoid gate
                gl = apply_linear(mp["shared_expert_gate"], x)
                se = jax.nn.sigmoid(gl.astype(jnp.float32)).astype(
                    x.dtype
                ) * se
            out = out + se
        if "shared_mlp" in mp:  # hunyuan ungated shared MLP
            out = out + gated_mlp(spec, mp["shared_mlp"], x)
        return out.reshape(B, T, D)
    if "experts_stacked" in mp and taps is None:  # ragged inference path
        out = _moe_stacked_dispatch(spec, mp, x, top_w, top_i)
        if "shared_expert" in mp:
            se = gated_mlp(spec, mp["shared_expert"], x)
            if "shared_expert_gate" in mp:  # qwen2_moe sigmoid gate
                gl = apply_linear(mp["shared_expert_gate"], x)
                se = jax.nn.sigmoid(gl.astype(jnp.float32)).astype(
                    x.dtype
                ) * se
            out = out + se
        if "shared_mlp" in mp:  # hunyuan ungated shared MLP
            out = out + gated_mlp(spec, mp["shared_mlp"], x)
        return out.reshape(B, T, D)

    # routing weight per (token, expert): [N, E]
    E = spec.num_experts
    w_full = jnp.zeros((B * T, E), dtype=jnp.float32)
    w_full = jax.vmap(lambda w, i, row: row.at[i].set(w))(
        top_w, top_i, w_full
    )

    out = jnp.zeros_like(x)
    experts = mp["experts"]
    if spec.moe_input_scaled:  # llama4: weight scales the expert INPUT
        for e in range(E):
            we = w_full[:, e].astype(x.dtype)
            routed = (we > 0).astype(x.dtype)
            xe = x * we[:, None]
            if taps is not None:
                y = gated_mlp(
                    spec, experts[e], xe, prefix=f"{prefix}.experts.{e}",
                    taps=taps, tap_paths=tap_paths, row_mask=routed,
                )
            else:
                y = gated_mlp(spec, experts[e], xe)
            out = out + y * routed[:, None]
        if "shared_expert" in mp:
            out = out + gated_mlp(
                spec, mp["shared_expert"], x, prefix=f"{prefix}.shared_expert",
                taps=taps, tap_paths=tap_paths,
            )
        return out.reshape(B, T, D)
    for e in range(E):
        we = w_full[:, e]  # [N]
        routed = (we > 0).astype(x.dtype)
        xe = x * routed[:, None] if taps is not None else x
        if taps is not None:
            ep = f"{prefix}.experts.{e}"
            y = gated_mlp(
                spec, experts[e], xe, prefix=ep, taps=taps,
                tap_paths=tap_paths, row_mask=routed,
            )
        else:
            y = gated_mlp(spec, experts[e], x)
        out = out + y * we[:, None].astype(x.dtype)
    if "shared_expert" in mp:  # qwen2_moe: sigmoid-gated always-on expert
        se = gated_mlp(
            spec, mp["shared_expert"], x, prefix=f"{prefix}.shared_expert",
            taps=taps, tap_paths=tap_paths,
        )
        gate_logit = apply_linear(mp["shared_expert_gate"], x)  # [N, 1]
        out = out + jax.nn.sigmoid(gate_logit.astype(jnp.float32)).astype(
            x.dtype
        ) * se
    if "shared_mlp" in mp:  # hunyuan_v1_moe: ungated always-on shared MLP
        out = out + gated_mlp(
            spec, mp["shared_mlp"], x, prefix=f"{prefix}.shared_mlp",
            taps=taps, tap_paths=tap_paths,
        )
    return out.reshape(B, T, D)


def deepseek_moe(
    spec: ModelSpec,
    mp: Params,
    h: jnp.ndarray,  # [B, T, hidden]
    prefix: str = "mlp",
    taps=None,
    tap_paths=frozenset(),
):
    """DeepSeek MoE: raw-parameter gate scored by softmax (v2) or sigmoid
    (v3), optional group-limited top-k (``group_limited_greedy`` /
    ``noaux_tc`` with e_score_correction_bias), routed_scaling_factor, and
    always-on shared experts (HF DeepseekV2MoEGate modeling :45,
    DeepseekV3TopkRouter modeling :109). Dense formulation like
    ``moe_mlp`` — every expert sees all rows with zeroed unrouted rows."""
    B, T, D = h.shape
    x = h.reshape(B * T, D)
    gate = mp["gate"]
    gw = jnp.asarray(gate["weight"]).astype(jnp.float32)
    logits = x.astype(jnp.float32) @ gw.T
    if spec.moe_scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)

    E, K = spec.num_experts, spec.num_experts_per_tok
    choose = scores
    if spec.moe_topk_method == "noaux_tc":
        # deepseek keeps the bias on the gate; ernie4_5_moe nests it in a
        # moe_statics module (modeling_ernie4_5_moe.py:277)
        bias_src = gate.get("e_score_correction_bias")
        if bias_src is None:
            bias_src = mp["moe_statics"]["e_score_correction_bias"]
        bias = jnp.asarray(bias_src, jnp.float32).reshape(-1)
        choose = scores + bias[None, :]
    if (
        spec.moe_topk_method in ("group_limited_greedy", "noaux_tc")
        and spec.n_group > 1
    ):
        g = spec.n_group
        cg = choose.reshape(-1, g, E // g)
        if spec.moe_topk_method == "noaux_tc":  # v3: sum of top-2 per group
            gs = jnp.sum(_topk(cg, 2)[0], axis=-1)
        else:  # v2: group max
            gs = jnp.max(cg, axis=-1)
        gidx = _topk(gs, spec.topk_group)[1]
        gmask = jnp.zeros_like(gs).at[
            jnp.arange(gs.shape[0])[:, None], gidx
        ].set(1.0)
        choose = jnp.where(gmask[..., None] > 0, cg, 0.0).reshape(-1, E)

    _, top_i = _topk(choose, K)
    top_w = jnp.take_along_axis(scores, top_i, axis=1)  # weights = RAW scores
    if spec.norm_topk_prob:
        top_w = top_w / (jnp.sum(top_w, axis=-1, keepdims=True) + 1e-20)
    top_w = top_w * spec.routed_scaling_factor

    if "experts_stacked_q" in mp and taps is None:  # packed ragged path
        out = _moe_stacked_dispatch(spec, mp, x, top_w, top_i)
        if "shared_experts" in mp:
            out = out + gated_mlp(spec, mp["shared_experts"], x)
        return out.reshape(B, T, D)
    if "experts_stacked" in mp and taps is None:  # ragged inference path
        out = _moe_stacked_dispatch(spec, mp, x, top_w, top_i)
        if "shared_experts" in mp:
            out = out + gated_mlp(spec, mp["shared_experts"], x)
        return out.reshape(B, T, D)

    w_full = jnp.zeros((B * T, E), dtype=jnp.float32)
    w_full = jax.vmap(lambda w, i, row: row.at[i].set(w))(top_w, top_i, w_full)

    out = jnp.zeros_like(x)
    experts = mp["experts"]
    for e in range(E):
        we = w_full[:, e]
        routed = (we > 0).astype(x.dtype)
        if taps is not None:
            xe = x * routed[:, None]
            y = gated_mlp(
                spec, experts[e], xe, prefix=f"{prefix}.experts.{e}",
                taps=taps, tap_paths=tap_paths, row_mask=routed,
            )
        else:
            y = gated_mlp(spec, experts[e], x)
        out = out + y * we[:, None].astype(x.dtype)

    if "shared_experts" in mp:
        out = out + gated_mlp(
            spec, mp["shared_experts"], x, prefix=f"{prefix}.shared_experts",
            taps=taps, tap_paths=tap_paths,
        )
    return out.reshape(B, T, D)


# --------------------------------------------------------------------------
# decoder layer / full model
# --------------------------------------------------------------------------


def decoder_layer(
    spec: ModelSpec,
    lp: Params,
    h: jnp.ndarray,
    cos,
    sin,
    attn_bias,
    cache: Optional[dict] = None,
    taps=None,
    tap_paths=frozenset(),
):
    # decilm/nemotron-nas attention-no_op block: no mixer, no input norm
    # (reference definitions/decilm.py layer_modules_strict=False; the NAS
    # block_configs mark whole sublayers absent)
    attn_noop = not any(
        k in lp for k in ("self_attn", "conv", "linear_attn", "mamba")
    )
    if attn_noop:
        normed = None
    elif spec.norm_after:  # olmo2/exaone4: raw input, norm on sublayer output
        normed = h
    else:
        normed = sublayer_norm(
            spec, lp.get("input_layernorm") or lp.get("operator_norm")
            or lp.get("attention_layernorm"), h  # apertus naming
        )
    if attn_noop:
        attn_out = None
    elif "conv" in lp:  # lfm2: gated short conv in the attn slot
        attn_out, cache = lfm2_shortconv(
            spec, lp["conv"], normed, cache, taps=taps, tap_paths=tap_paths,
        )
    elif "linear_attn" in lp:  # qwen3_next GatedDeltaNet layer
        attn_out, cache = qwen3next_deltanet(
            spec, lp["linear_attn"], normed, cache,
            taps=taps, tap_paths=tap_paths,
        )
    elif "mamba" in lp:  # bamba/granitemoehybrid SSD or jamba mamba1 mixer
        mixer = mamba2_mixer if "dt_bias" in lp["mamba"] else mamba_mixer
        attn_out, cache = mixer(
            spec, lp["mamba"], normed, cache, prefix="mamba",
            taps=taps, tap_paths=tap_paths,
        )
    elif "linear_attn" in lp["self_attn"]:
        # decilm replace_with_linear: a single Linear in the attention slot
        _tap(taps, tap_paths, "self_attn.linear_attn", normed)
        attn_out = apply_linear(lp["self_attn"]["linear_attn"], normed)
    elif "kv_a_proj_with_mqa" in lp["self_attn"]:  # deepseek MLA
        attn_out, cache = mla_attention(
            spec, lp["self_attn"], normed, cos, sin, attn_bias, cache,
            taps=taps, tap_paths=tap_paths,
        )
    else:
        attn_out, cache = attention(
            spec, lp["self_attn"], normed, cos, sin, attn_bias, cache,
            taps=taps, tap_paths=tap_paths,
        )
    if spec.parallel_residual:
        # cohere: shared-ln parallel attn+mlp (modeling_cohere.py:323-338)
        mlp_out = gated_mlp(spec, lp["mlp"], normed, taps=taps, tap_paths=tap_paths)
        return h + attn_out + mlp_out, cache
    rmult = spec.residual_multiplier  # granite (modeling_granite.py:288)
    if spec.norm_after:  # olmo2/exaone4 (modeling_olmo2.py:250-257)
        attn_out = sublayer_norm(spec, lp["post_attention_layernorm"], attn_out)
        h = h + attn_out * rmult if rmult != 1.0 else h + attn_out
        normed2 = h
    elif spec.post_norms:  # gemma2/glm4 post-attention norm before residual
        # glm4 uses post_self_attn/post_attention/post_mlp names for the
        # same sandwich structure as gemma2's post_attention/
        # pre_feedforward/post_feedforward (modeling_glm4.py:75-111)
        glm4 = "post_self_attn_layernorm" in lp
        pa = lp["post_self_attn_layernorm" if glm4 else "post_attention_layernorm"]
        attn_out = rms_norm(
            attn_out, pa["weight"], spec.rms_norm_eps, spec.rms_norm_offset,
        )
        h = h + attn_out
        pre = lp["post_attention_layernorm" if glm4 else "pre_feedforward_layernorm"]
        normed2 = rms_norm(
            h, pre["weight"], spec.rms_norm_eps, spec.rms_norm_offset,
        )
    else:
        if attn_out is not None:
            h = h + attn_out * rmult if rmult != 1.0 else h + attn_out
        if not any(k in lp for k in ("block_sparse_moe", "mlp",
                                     "feed_forward", "shared_mlp")):
            return h, cache  # decilm ffn-no_op block
        pre_mlp = (lp.get("post_attention_layernorm")
                   or lp.get("pre_ff_layernorm") or lp.get("ffn_norm")
                   or lp.get("feedforward_layernorm")  # apertus naming
                   or lp.get("pre_feedforward_layernorm"))  # vaultgemma
        normed2 = sublayer_norm(spec, pre_mlp, h)

    if "block_sparse_moe" in lp:  # mixtral/granitemoe container naming
        mlp_out = moe_mlp(
            spec, lp["block_sparse_moe"], normed2, prefix="block_sparse_moe",
            taps=taps, tap_paths=tap_paths,
        )
        if "shared_mlp" in lp:  # granitemoehybrid always-on shared MLP
            mlp_out = mlp_out + gated_mlp(
                spec, lp["shared_mlp"], normed2, prefix="shared_mlp",
                taps=taps, tap_paths=tap_paths,
            )
    elif spec.num_experts > 0 and any(
        key in (lp.get("mlp") or lp.get("feed_forward") or {})
        for key in ("experts", "experts_stacked", "experts_stacked_q")
    ):
        mkey = "mlp" if "mlp" in lp else "feed_forward"
        mc = lp[mkey]
        if ("shared_experts" in mc or "moe_statics" in mc
                or spec.model_type.startswith("deepseek")):
            mlp_out = deepseek_moe(
                spec, mc, normed2, prefix=mkey, taps=taps, tap_paths=tap_paths
            )
        else:
            mlp_out = moe_mlp(
                spec, mc, normed2, prefix=mkey, taps=taps, tap_paths=tap_paths
            )
    else:
        mkey = ("mlp" if "mlp" in lp
                else "feed_forward" if "feed_forward" in lp else "shared_mlp")
        if "linear_mlp" in lp[mkey]:
            # decilm ffn replace_with_linear: single Linear in the mlp slot
            _tap(taps, tap_paths, f"{mkey}.linear_mlp", normed2)
            mlp_out = apply_linear(lp[mkey]["linear_mlp"], normed2)
        else:
            mlp_out = gated_mlp(
                spec, lp[mkey], normed2, prefix=mkey,
                taps=taps, tap_paths=tap_paths,
            )

    if spec.norm_after:  # olmo2/exaone4
        mlp_out = sublayer_norm(spec, lp["post_feedforward_layernorm"], mlp_out)
    elif spec.post_norms:
        pm = lp.get("post_mlp_layernorm") or lp["post_feedforward_layernorm"]
        mlp_out = rms_norm(
            mlp_out, pm["weight"], spec.rms_norm_eps, spec.rms_norm_offset,
        )
    if spec.residual_multiplier != 1.0:  # granite
        return h + mlp_out * spec.residual_multiplier, cache
    return h + mlp_out, cache


def model_root(spec: ModelSpec, params: Params) -> Params:
    """The container holding embeddings/layers/final norm (opt nests a
    ``decoder`` level; gpt2/bloom use a ``transformer`` root)."""
    if spec.family == "opt":
        return params["model"]["decoder"]
    if spec.family in ("gpt2", "bloom"):
        return params["transformer"]
    if spec.family == "neox":
        return params[_neox_names(spec)["root"]]
    if spec.family == "mamba":
        return params["backbone"]
    return params["model"]


def layers_key(spec: ModelSpec) -> str:
    if spec.family == "neox":
        return _neox_names(spec)["layers"]
    return "h" if spec.family in ("gpt2", "bloom") else "layers"


def model_layers(spec: ModelSpec, params: Params) -> list:
    return model_root(spec, params)[layers_key(spec)]


def set_model_layers(spec: ModelSpec, params: Params, layers: list):
    model_root(spec, params)[layers_key(spec)] = layers


def _embed_key(spec: ModelSpec) -> str:
    if spec.family == "neox":
        return _neox_names(spec)["embed"]
    return {"gpt2": "wte", "bloom": "word_embeddings",
            "mamba": "embeddings"}.get(spec.family, "embed_tokens")


def embed(
    spec: ModelSpec,
    params: Params,
    input_ids: jnp.ndarray,
    dtype=jnp.float32,
    positions: Optional[jnp.ndarray] = None,
):
    root = model_root(spec, params)
    emb = jnp.asarray(root[_embed_key(spec)]["weight"])
    h = emb[input_ids].astype(dtype)
    if spec.embedding_multiplier != 1.0:
        h = h * jnp.asarray(spec.embedding_multiplier, dtype)
    if spec.family in ("opt", "gpt2"):  # learned positions (opt: +2 offset)
        if positions is None:
            B, T = input_ids.shape
            positions = jnp.broadcast_to(jnp.arange(T), (B, T))
        pe_key = "embed_positions" if spec.family == "opt" else "wpe"
        off = 2 if spec.family == "opt" else 0
        pe = jnp.asarray(root[pe_key]["weight"])
        h = h + pe[positions + off].astype(dtype)
    if spec.family == "bloom":  # embedding layernorm
        n = root["word_embeddings_layernorm"]
        h = layer_norm(h, n["weight"], n.get("bias"), spec.rms_norm_eps)
    return h


def final_norm(spec: ModelSpec, params: Params, h: jnp.ndarray) -> jnp.ndarray:
    root = model_root(spec, params)
    if spec.family == "opt":
        n = root["final_layer_norm"]
        return layer_norm(h, n["weight"], n.get("bias"), 1e-5)
    if spec.family in ("gpt2", "bloom"):
        n = root["ln_f"]
        return layer_norm(h, n["weight"], n.get("bias"), spec.rms_norm_eps)
    if spec.family == "neox":
        n = root[_neox_names(spec)["final"]]
        return layer_norm(h, n["weight"], n.get("bias"), spec.rms_norm_eps)
    if spec.family == "mamba":
        return rms_norm(h, root["norm_f"]["weight"], spec.rms_norm_eps)
    # olmo's non-parametric norm has no tensors at all; bamba calls the
    # final norm "final_layernorm", lfm2 "embedding_norm"
    n = (root.get("norm") or root.get("final_layernorm")
         or root.get("embedding_norm"))
    return sublayer_norm(spec, n, h)


# --------------------------------------------------------------------------
# opt family (learned positions, LayerNorm+bias, relu MLP, no RoPE)
# --------------------------------------------------------------------------


def opt_attention(
    spec: ModelSpec,
    ap: Params,
    h: jnp.ndarray,
    attn_bias,
    cache: Optional[dict] = None,
    prefix: str = "self_attn",
    taps=None,
    tap_paths=frozenset(),
):
    B, T, _ = h.shape
    nh, hd = spec.num_heads, spec.head_dim
    for name in ("q_proj", "k_proj", "v_proj"):
        _tap(taps, tap_paths, f"{prefix}.{name}", h)
    # OPT scales the QUERY by hd^-0.5 before the dot (matches HF exactly)
    q = (apply_linear(ap["q_proj"], h) * (hd**-0.5)).reshape(B, T, nh, hd)
    k = apply_linear(ap["k_proj"], h).reshape(B, T, nh, hd)
    v = apply_linear(ap["v_proj"], h).reshape(B, T, nh, hd)
    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))

    if cache is not None:
        pos = cache["pos"]
        if jnp.ndim(pos) == 0:
            k = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype), (0, 0, pos, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype), (0, 0, pos, 0))
            cache = {"k": k, "v": v, "pos": pos + T}
        else:
            bidx = jnp.arange(B)
            k = cache["k"].at[bidx, :, pos, :].set(k[:, :, 0, :].astype(cache["k"].dtype))
            v = cache["v"].at[bidx, :, pos, :].set(v[:, :, 0, :].astype(cache["v"].dtype))
            cache = {"k": k, "v": v, "pos": pos + 1}

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if attn_bias is not None:
        logits = logits + attn_bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(q.dtype))
    out = out.transpose(0, 2, 1, 3).reshape(B, T, nh * hd)
    _tap(taps, tap_paths, f"{prefix}.out_proj", out)
    return apply_linear(ap["out_proj"], out), cache


def opt_decoder_layer(
    spec: ModelSpec,
    lp: Params,
    h: jnp.ndarray,
    attn_bias,
    cache: Optional[dict] = None,
    taps=None,
    tap_paths=frozenset(),
):
    eps = 1e-5
    residual = h
    n1 = lp["self_attn_layer_norm"]
    if spec.do_layer_norm_before:
        h = layer_norm(h, n1["weight"], n1.get("bias"), eps)
    attn_out, cache = opt_attention(
        spec, lp["self_attn"], h, attn_bias, cache, taps=taps, tap_paths=tap_paths
    )
    h = residual + attn_out
    if not spec.do_layer_norm_before:
        h = layer_norm(h, n1["weight"], n1.get("bias"), eps)

    residual = h
    n2 = lp["final_layer_norm"]
    if spec.do_layer_norm_before:
        h = layer_norm(h, n2["weight"], n2.get("bias"), eps)
    _tap(taps, tap_paths, "fc1", h)
    x = _act(spec.hidden_act)(apply_linear(lp["fc1"], h))
    _tap(taps, tap_paths, "fc2", x)
    x = apply_linear(lp["fc2"], x)
    h = residual + x
    if not spec.do_layer_norm_before:
        h = layer_norm(h, n2["weight"], n2.get("bias"), eps)
    return h, cache


# --------------------------------------------------------------------------
# gpt2 family (Conv1D fused c_attn, learned positions, gelu_new MLP)
# --------------------------------------------------------------------------


def gpt2_attention(
    spec: ModelSpec,
    ap: Params,
    h: jnp.ndarray,
    attn_bias,
    cache: Optional[dict] = None,
    prefix: str = "attn",
    taps=None,
    tap_paths=frozenset(),
):
    """GPT-2 attention: ONE fused c_attn projection -> [q|k|v] thirds
    (HF GPT2Attention; Conv1D weights are canonicalized to [out, in] at
    load, see loader conv1d_suffixes)."""
    B, T, _ = h.shape
    nh, hd = spec.num_heads, spec.head_dim
    nkv = spec.num_kv_heads
    if "attention" in ap:  # gpt_neo: nested SPLIT q/k/v/out_proj Linears
        aa = ap["attention"]
        for leaf in ("q_proj", "k_proj", "v_proj"):
            _tap(taps, tap_paths, f"{prefix}.attention.{leaf}", h)
        q = apply_linear(aa["q_proj"], h).reshape(B, T, nh, hd)
        k = apply_linear(aa["k_proj"], h).reshape(B, T, nkv, hd)
        v = apply_linear(aa["v_proj"], h).reshape(B, T, nkv, hd)
    elif "q_proj" in ap:  # gpt_pangu: DIRECT split q/k/v Linears
        for leaf in ("q_proj", "k_proj", "v_proj"):
            _tap(taps, tap_paths, f"{prefix}.{leaf}", h)
        q = apply_linear(ap["q_proj"], h).reshape(B, T, nh, hd)
        k = apply_linear(ap["k_proj"], h).reshape(B, T, nkv, hd)
        v = apply_linear(ap["v_proj"], h).reshape(B, T, nkv, hd)
    else:
        _tap(taps, tap_paths, f"{prefix}.c_attn", h)
        qkv = apply_linear(ap["c_attn"], h)
        if nkv != nh:  # gpt_bigcode MQA: c_attn -> [q | k(1 head) | v(1 head)]
            q, k, v = jnp.split(qkv, [nh * hd, nh * hd + nkv * hd], axis=-1)
            q = q.reshape(B, T, nh, hd)
            k = k.reshape(B, T, nkv, hd)
            v = v.reshape(B, T, nkv, hd)
        elif spec.model_type == "gpt_bigcode":
            # bigcode MHA: per-head fused [q_h|k_h|v_h] blocks
            # (modeling_gpt_bigcode.py:220-223)
            q, k, v = jnp.split(qkv.reshape(B, T, nh, 3 * hd), 3, axis=-1)
        else:
            q, k, v = (t.reshape(B, T, nh, hd) for t in jnp.split(qkv, 3, axis=-1))
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    if cache is not None:  # cache holds nkv heads; GQA-expand after read
        k, v, cache = _cache_write_read(cache, k, v, B, T, q.dtype)
    if k.shape[1] != nh:
        k = jnp.repeat(k, nh // k.shape[1], axis=1)
        v = jnp.repeat(v, nh // v.shape[1], axis=1)

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (spec.attn_scale or hd**-0.5)  # gpt_neo: NO scaling (attn_scale=1)
    if attn_bias is not None:
        logits = logits + attn_bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(q.dtype))
    out = out.transpose(0, 2, 1, 3).reshape(B, T, nh * hd)
    if "attention" in ap:  # gpt_neo out_proj naming
        _tap(taps, tap_paths, f"{prefix}.attention.out_proj", out)
        return apply_linear(ap["attention"]["out_proj"], out), cache
    _tap(taps, tap_paths, f"{prefix}.c_proj", out)
    return apply_linear(ap["c_proj"], out), cache


def gpt2_decoder_layer(
    spec: ModelSpec,
    lp: Params,
    h: jnp.ndarray,
    attn_bias,
    cache: Optional[dict] = None,
    taps=None,
    tap_paths=frozenset(),
):
    eps = spec.rms_norm_eps
    n1 = lp["ln_1"]
    normed = layer_norm(h, n1["weight"], n1.get("bias"), eps)
    attn_out, cache = gpt2_attention(
        spec, lp["attn"], normed, attn_bias, cache, taps=taps, tap_paths=tap_paths
    )
    h = h + attn_out
    n2 = lp["ln_2"]
    normed2 = layer_norm(h, n2["weight"], n2.get("bias"), eps)
    _tap(taps, tap_paths, "mlp.c_fc", normed2)
    x = _act(spec.hidden_act)(apply_linear(lp["mlp"]["c_fc"], normed2))
    _tap(taps, tap_paths, "mlp.c_proj", x)
    return h + apply_linear(lp["mlp"]["c_proj"], x), cache


# --------------------------------------------------------------------------
# bloom family (ALiBi, per-head-interleaved fused QKV)
# --------------------------------------------------------------------------


def mpt_alibi_slopes(num_heads: int, alibi_bias_max: int = 8) -> np.ndarray:
    """MPT ALiBi slopes (modeling_mpt.py:45-65): computed over the NEXT power
    of two with 2^(-i*bias_max/n2), odd-index-first reorder for non-pow2."""
    import math

    n2 = 2 ** math.ceil(math.log2(num_heads))
    base = np.arange(1, n2 + 1, dtype=np.float32) * (alibi_bias_max / n2)
    slopes = 1.0 / np.power(2.0, base)
    if n2 != num_heads:
        slopes = np.concatenate([slopes[1::2], slopes[0::2]])[:num_heads]
    return slopes.astype(np.float32)


def alibi_slopes(num_heads: int) -> np.ndarray:
    """Standard ALiBi head slopes (HF BloomModel.build_alibi_tensor math)."""
    import math

    closest = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = [base**i for i in range(1, closest + 1)]
    if closest != num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        slopes += [extra_base**i for i in range(1, 2 * (num_heads - closest), 2)]
    return np.asarray(slopes, dtype=np.float32)


def bloom_attention(
    spec: ModelSpec,
    ap: Params,
    h: jnp.ndarray,
    attn_bias,
    cache: Optional[dict] = None,
    prefix: str = "self_attention",
    taps=None,
    tap_paths=frozenset(),
):
    """Bloom attention: fused query_key_value whose OUTPUT interleaves per
    head — reshape [B,T,nh,3,hd] then split (HF BloomAttention) — plus ALiBi
    additive bias ``slope_h * key_index`` (key index = physical cache slot;
    exact for un-padded prompts, decode continues the same indexing)."""
    B, T, _ = h.shape
    nh, hd = spec.num_heads, spec.head_dim
    _tap(taps, tap_paths, f"{prefix}.query_key_value", h)
    qkv = apply_linear(ap["query_key_value"], h).reshape(B, T, nh, 3, hd)
    q = qkv[:, :, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, :, 2].transpose(0, 2, 1, 3)

    if cache is not None:
        k, v, cache = _cache_write_read(cache, k, v, B, T, q.dtype)

    S = k.shape[2]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (hd**-0.5)
    slopes = jnp.asarray(alibi_slopes(nh))
    alibi = slopes[:, None, None] * jnp.arange(S, dtype=jnp.float32)[None, None, :]
    logits = logits + alibi[None]
    if attn_bias is not None:
        logits = logits + attn_bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(q.dtype))
    out = out.transpose(0, 2, 1, 3).reshape(B, T, nh * hd)
    _tap(taps, tap_paths, f"{prefix}.dense", out)
    return apply_linear(ap["dense"], out), cache


def bloom_decoder_layer(
    spec: ModelSpec,
    lp: Params,
    h: jnp.ndarray,
    attn_bias,
    cache: Optional[dict] = None,
    taps=None,
    tap_paths=frozenset(),
):
    eps = spec.rms_norm_eps
    n1 = lp["input_layernorm"]
    ln1 = layer_norm(h, n1["weight"], n1.get("bias"), eps)
    attn_out, cache = bloom_attention(
        spec, lp["self_attention"], ln1, attn_bias, cache,
        taps=taps, tap_paths=tap_paths,
    )
    residual = ln1 if spec.apply_residual_post_ln else h
    h = residual + attn_out

    n2 = lp["post_attention_layernorm"]
    ln2 = layer_norm(h, n2["weight"], n2.get("bias"), eps)
    _tap(taps, tap_paths, "mlp.dense_h_to_4h", ln2)
    x = _act(spec.hidden_act)(apply_linear(lp["mlp"]["dense_h_to_4h"], ln2))
    _tap(taps, tap_paths, "mlp.dense_4h_to_h", x)
    x = apply_linear(lp["mlp"]["dense_4h_to_h"], x)
    residual = ln2 if spec.apply_residual_post_ln else h
    return residual + x, cache


# --------------------------------------------------------------------------
# neox family (gpt_neox / gptj / falcon / phi / stablelm): LayerNorm+bias,
# partial rotary, optional parallel attn+mlp residual
# --------------------------------------------------------------------------

# Per-arch container/projection names (reference definitions/gpt_neox.py:11,
# gptj.py:11, falcon.py:11, phi.py:11, stablelm.py:11 module trees).
_NEOX_NAMES = {
    "gpt_neox": dict(root="gpt_neox", layers="layers", embed="embed_in",
                     final="final_layer_norm", head="embed_out",
                     attn="attention", o="dense"),
    "gptj": dict(root="transformer", layers="h", embed="wte",
                 final="ln_f", head="lm_head", attn="attn", o="out_proj"),
    "codegen": dict(root="transformer", layers="h", embed="wte",
                    final="ln_f", head="lm_head", attn="attn", o="out_proj"),
    "falcon": dict(root="transformer", layers="h", embed="word_embeddings",
                   final="ln_f", head="lm_head", attn="self_attention",
                   o="dense"),
    "phi": dict(root="model", layers="layers", embed="embed_tokens",
                final="final_layernorm", head="lm_head", attn="self_attn",
                o="dense"),
    "stablelm": dict(root="model", layers="layers", embed="embed_tokens",
                     final="norm", head="lm_head", attn="self_attn",
                     o="o_proj"),
    "persimmon": dict(root="model", layers="layers", embed="embed_tokens",
                      final="final_layernorm", head="lm_head",
                      attn="self_attn", o="dense"),
    "mpt": dict(root="transformer", layers="blocks", embed="wte",
                final="norm_f", head="lm_head", attn="attn", o="out_proj"),
}
# RefinedWeb(Model): falcon-rw remote-code names (reference definitions/rw.py)
_NEOX_NAMES["RefinedWeb"] = _NEOX_NAMES["refinedweb"] = _NEOX_NAMES["falcon"]
_NEOX_NAMES["RefinedWebModel"] = _NEOX_NAMES["falcon"]
_NEOX_NAMES["refinedwebmodel"] = _NEOX_NAMES["falcon"]


def _neox_names(spec: ModelSpec) -> dict:
    from gptqmodel_tpu.models.spec import _SPEC_ALIASES

    mt = _SPEC_ALIASES.get(spec.model_type, spec.model_type)
    return _NEOX_NAMES.get(mt, _NEOX_NAMES["gpt_neox"])


def _apply_partial_rope(spec: ModelSpec, q, k, cos, sin):
    """Rotate the first ``rotary_dim`` dims (HF partial_rotation), neox
    rotate-half or gptj pair-interleaved convention."""
    rd = spec.rotary_dim or spec.head_dim
    rot = apply_rope_interleaved if spec.rope_interleave else apply_rope
    if rd >= q.shape[-1]:
        return rot(q, k, cos, sin)
    q_r, k_r = rot(q[..., :rd], k[..., :rd], cos, sin)
    q = jnp.concatenate([q_r, q[..., rd:]], axis=-1)
    k = jnp.concatenate([k_r, k[..., rd:]], axis=-1)
    return q, k


def neox_attention(
    spec: ModelSpec,
    ap: Params,
    h: jnp.ndarray,
    cos,
    sin,
    attn_bias,
    cache: Optional[dict] = None,
    prefix: str = "attention",
    taps=None,
    tap_paths=frozenset(),
    o_name: str = "dense",
):
    """Neox-lineage attention: fused or split qkv, partial rotary, optional
    ALiBi (falcon-rw). Fused layouts (HF GPTNeoXAttention / Falcon
    _split_heads):
    - neox_fused: [B,T,nh,3*hd] thirds (also falcon-rw per-head [nh,3,hd])
    - falcon_fused (multi_query): [B,T,nh+2,hd], last two rows are k/v (MQA)
    - falcon_grouped (new arch): [B,T,nkv,nh/nkv+2,hd], k/v shared per group
    """
    B, T, _ = h.shape
    nh, nkv, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim

    if "query_key_value" in ap:
        _tap(taps, tap_paths, f"{prefix}.query_key_value", h)
        qkv = apply_linear(ap["query_key_value"], h)
        if spec.qkv_layout == "falcon_fused":  # MQA: nkv == 1
            qkv = qkv.reshape(B, T, nh + 2, hd)
            q = qkv[:, :, :-2]
            k = qkv[:, :, -2:-1]
            v = qkv[:, :, -1:]
        elif spec.qkv_layout == "falcon_grouped":
            g = nh // nkv
            qkv = qkv.reshape(B, T, nkv, g + 2, hd)
            q = qkv[:, :, :, :-2].reshape(B, T, nh, hd)
            k = qkv[:, :, :, -2]
            v = qkv[:, :, :, -1]
        else:  # neox_fused: per-head [q|k|v] thirds
            qkv = qkv.reshape(B, T, nh, 3 * hd)
            q, k, v = jnp.split(qkv, 3, axis=-1)
    elif "Wqkv" in ap:  # mpt: global [q|k|v] concat (modeling_mpt.py:85-107)
        _tap(taps, tap_paths, f"{prefix}.Wqkv", h)
        qkv = apply_linear(ap["Wqkv"], h)
        if spec.clip_qkv:
            qkv = jnp.clip(qkv, -spec.clip_qkv, spec.clip_qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, nh, hd)
        k = k.reshape(B, T, nkv, hd)
        v = v.reshape(B, T, nkv, hd)
    else:
        _tap(taps, tap_paths, f"{prefix}.q_proj", h)
        _tap(taps, tap_paths, f"{prefix}.k_proj", h)
        _tap(taps, tap_paths, f"{prefix}.v_proj", h)
        q = apply_linear(ap["q_proj"], h).reshape(B, T, nh, hd)
        k = apply_linear(ap["k_proj"], h).reshape(B, T, nkv, hd)
        v = apply_linear(ap["v_proj"], h).reshape(B, T, nkv, hd)

    q = q.transpose(0, 2, 1, 3)  # [B, H, T, D]
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if not spec.alibi:
        q, k = _apply_partial_rope(spec, q, k, cos, sin)

    if cache is not None:
        k, v, cache = _cache_write_read(cache, k, v, B, T, q.dtype)

    scale = hd**-0.5
    rep = nh // k.shape[1]
    S = k.shape[2]
    # Falcon-rw ALiBi: added BEFORE the 1/sqrt(hd) scaling, slopes routed
    # through bfloat16 (HF build_alibi_tensor + FalconAttention eager:
    # logits = (q@k + alibi) * inv_norm_factor) — so pre-multiply by scale.
    alibi = None
    if spec.alibi:
        if spec.model_type == "mpt":
            # MPT slopes (build_mpt_alibi_tensor, modeling_mpt.py:45-65):
            # 2^(-i*bias_max/ceil_pow2), interleave-reordered when heads
            # aren't a power of two; added AFTER the softmax scaling
            slopes = jnp.asarray(mpt_alibi_slopes(nh))
            alibi = (
                slopes[:, None, None]
                * jnp.arange(S, dtype=jnp.float32)[None, None, :]
            )
        else:
            slopes = jnp.asarray(alibi_slopes(nh)).astype(jnp.bfloat16).astype(
                jnp.float32
            )
            alibi = (
                slopes[:, None, None]
                * jnp.arange(S, dtype=jnp.float32)[None, None, :]
                * scale
            )  # [nh, 1, S]
    if rep > 1:
        qg = q.reshape(B, k.shape[1], rep, T, hd)
        logits = jnp.einsum(
            "bgrqd,bgkd->bgrqk", qg, k, preferred_element_type=jnp.float32
        ) * scale
        if alibi is not None:
            logits = logits + alibi.reshape(k.shape[1], rep, 1, S)[None]
        if attn_bias is not None:
            logits = logits + attn_bias.astype(logits.dtype)[:, :, None]
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", probs, v.astype(q.dtype))
        out = out.reshape(B, nh, T, hd)
    else:
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if alibi is not None:
            logits = logits + alibi[None]
        if attn_bias is not None:
            logits = logits + attn_bias.astype(logits.dtype)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(q.dtype))
    out = out.transpose(0, 2, 1, 3).reshape(B, T, nh * hd)
    _tap(taps, tap_paths, f"{prefix}.{o_name}", out)
    return apply_linear(ap[o_name], out), cache


def neox_mlp(spec, mp, h, taps=None, tap_paths=frozenset(), prefix="mlp"):
    """fc-pair MLP under each arch's names, or stablelm's gated silu MLP."""
    if spec.neox_gated_mlp:
        return gated_mlp(spec, mp, h, prefix=prefix, taps=taps,
                         tap_paths=tap_paths)
    for a, b in (("dense_h_to_4h", "dense_4h_to_h"), ("fc_in", "fc_out"),
                 ("fc1", "fc2"), ("up_proj", "down_proj")):
        if a in mp:
            _tap(taps, tap_paths, f"{prefix}.{a}", h)
            x = _act(spec.hidden_act)(apply_linear(mp[a], h))
            _tap(taps, tap_paths, f"{prefix}.{b}", x)
            return apply_linear(mp[b], x)
    raise KeyError(f"unrecognized neox mlp params: {list(mp)}")


def _neox_ln(lp: Params, which: str, eps: float, x):
    """Resolve the attn/mlp-branch LayerNorm across arch naming variants."""
    if which == "attn":
        n = (lp.get("input_layernorm") or lp.get("ln_1") or lp.get("ln_attn")
             or lp.get("norm_1"))
    else:
        n = (lp.get("post_attention_layernorm") or lp.get("ln_mlp")
             or lp.get("norm_2") or lp.get("input_layernorm") or lp.get("ln_1"))
    return layer_norm(x, n["weight"], n.get("bias"), eps)


def neox_decoder_layer(
    spec: ModelSpec,
    lp: Params,
    h: jnp.ndarray,
    cos,
    sin,
    attn_bias,
    cache: Optional[dict] = None,
    taps=None,
    tap_paths=frozenset(),
):
    """HF GPTNeoXLayer / GPTJBlock / FalconDecoderLayer / PhiDecoderLayer /
    StableLmDecoderLayer residual flow:
    - parallel: x + attn(ln_a(x)) + mlp(ln_m(x)); ln_m is a separate norm
      (neox, falcon new-arch dual-ln) or the same ln_a output (gptj, phi,
      falcon-7b single-ln parallel).
    - sequential: a = x + attn(ln1(x)); out = a + mlp(ln2(a)).
    """
    names = _neox_names(spec)
    eps = spec.rms_norm_eps
    attn_c = names["attn"]

    if spec.parallel_residual:
        ln_a = _neox_ln(lp, "attn", eps, h)
        ln_m = _neox_ln(lp, "mlp", eps, h) if spec.dual_parallel_ln else ln_a
        attn_out, cache = neox_attention(
            spec, lp[attn_c], ln_a, cos, sin, attn_bias, cache,
            prefix=attn_c, taps=taps, tap_paths=tap_paths, o_name=names["o"],
        )
        mlp_out = neox_mlp(spec, lp.get("mlp") or lp["ffn"], ln_m,
                           taps=taps, tap_paths=tap_paths,
                           prefix="mlp" if "mlp" in lp else "ffn")
        return h + attn_out + mlp_out, cache

    ln1 = _neox_ln(lp, "attn", eps, h)
    attn_out, cache = neox_attention(
        spec, lp[attn_c], ln1, cos, sin, attn_bias, cache,
        prefix=attn_c, taps=taps, tap_paths=tap_paths, o_name=names["o"],
    )
    a = h + attn_out
    ln2 = _neox_ln(lp, "mlp", eps, a)
    mlp_out = neox_mlp(spec, lp.get("mlp") or lp["ffn"], ln2,
                       taps=taps, tap_paths=tap_paths,
                       prefix="mlp" if "mlp" in lp else "ffn")
    return a + mlp_out, cache


def any_decoder_layer(
    spec: ModelSpec,
    lp: Params,
    h: jnp.ndarray,
    cos,
    sin,
    attn_bias,
    cache: Optional[dict] = None,
    taps=None,
    tap_paths=frozenset(),
):
    """Family dispatcher used by the looper and the inference engine."""
    if spec.longcat:
        return longcat_decoder_layer(
            spec, lp, h, cos, sin, attn_bias, cache, taps, tap_paths
        )
    if spec.falcon_h1:
        return falcon_h1_decoder_layer(
            spec, lp, h, cos, sin, attn_bias, cache, taps, tap_paths
        )
    if spec.minimax_residual:
        return minimax_decoder_layer(
            spec, lp, h, cos, sin, attn_bias, cache, taps, tap_paths
        )
    if spec.family == "mamba":
        return mamba_decoder_layer(spec, lp, h, cache, taps, tap_paths)
    if spec.family == "opt":
        return opt_decoder_layer(spec, lp, h, attn_bias, cache, taps, tap_paths)
    if spec.family == "gpt2":
        return gpt2_decoder_layer(spec, lp, h, attn_bias, cache, taps, tap_paths)
    if spec.family == "bloom":
        return bloom_decoder_layer(spec, lp, h, attn_bias, cache, taps, tap_paths)
    if spec.family == "neox":
        return neox_decoder_layer(
            spec, lp, h, cos, sin, attn_bias, cache, taps, tap_paths
        )
    return decoder_layer(spec, lp, h, cos, sin, attn_bias, cache, taps, tap_paths)


def model_hidden(
    spec: ModelSpec,
    params: Params,
    input_ids: jnp.ndarray,  # [B, T]
    positions: Optional[jnp.ndarray] = None,
    attn_bias="causal",
    caches: Optional[list] = None,
    dtype=jnp.float32,
):
    """Full decoder stack -> final-norm hidden states [B, T, hidden]."""
    B, T = input_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    cos, sin = rope_cos_sin(spec, positions)
    has_sliding = any(layer_is_sliding(spec, i) for i in range(spec.num_layers))
    cos_l, sin_l = (
        rope_cos_sin(spec, positions, local=True) if has_sliding else (cos, sin)
    )
    bias_l = None
    if isinstance(attn_bias, str) and attn_bias == "causal":
        kv_len = (
            next((c["k"].shape[2] for c in caches if "k" in c), T)
            if caches else T
        )
        attn_bias = make_causal_mask(T, kv_len, window=0)
        if has_sliding:
            bias_l = make_causal_mask(
                T, kv_len, window=spec.sliding_window,
                chunk=spec.attention_chunk_size,
            )
    h = embed(spec, params, input_ids, dtype, positions)
    new_caches = [] if caches is not None else None
    ctx = {"cos": cos, "sin": sin, "bias": attn_bias}
    if has_sliding:
        ctx.update(cos_l=cos_l, sin_l=sin_l)
        if bias_l is not None:
            ctx["bias_l"] = bias_l
    if spec.attn_temp_tuning:  # llama4 NoPE q temperature
        ctx["attn_temp"] = (
            jnp.log1p(jnp.floor((positions.astype(jnp.float32) + 1.0)
                                / spec.attn_temp_floor))
            * spec.attn_temp_scale + 1.0
        )
    for i, lp in enumerate(model_layers(spec, params)):
        cache_i = caches[i] if caches is not None else None
        if i in spec.skip_layers:
            # mllama cross-attention layers are skipped entirely on the
            # text-only path (modeling_mllama.py MllamaTextModel.forward:
            # "For text-only path we should skip cross attention layers");
            # their cache slot passes through untouched
            if new_caches is not None:
                new_caches.append(cache_i)
            continue
        c_i, s_i, b_i = layer_rope_bias(spec, i, ctx)
        h, cache_i = any_decoder_layer(spec, lp, h, c_i, s_i, b_i, cache_i)
        if new_caches is not None:
            new_caches.append(cache_i)
    h = final_norm(spec, params, h)
    return h, new_caches


def lm_head_key(spec: ModelSpec) -> str:
    """Top-level LM head param name ("embed_out" for gpt_neox)."""
    return _neox_names(spec)["head"] if spec.family == "neox" else "lm_head"


def lm_logits(spec: ModelSpec, params: Params, hidden: jnp.ndarray):
    head = lm_head_key(spec)
    if spec.tie_word_embeddings or head not in params:
        w = jnp.asarray(model_root(spec, params)[_embed_key(spec)]["weight"])
        logits = hidden @ w.T.astype(hidden.dtype)
    else:
        logits = apply_linear(params[head], hidden)
    if spec.logit_scale != 1.0:  # cohere ×logit_scale / granite ÷logits_scaling
        logits = logits * spec.logit_scale
    if spec.logit_softcap:
        logits = jnp.tanh(logits / spec.logit_softcap) * spec.logit_softcap
    return logits


def forward_logits(spec: ModelSpec, params: Params, input_ids, dtype=jnp.float32):
    h, _ = model_hidden(spec, params, input_ids, dtype=dtype)
    return lm_logits(spec, params, h)


# --------------------------------------------------------------------------
# mamba family (falcon_mamba: selective-state-space mixer blocks)
# --------------------------------------------------------------------------


def _causal_conv1d(x: jnp.ndarray, w: jnp.ndarray, b, k: int) -> jnp.ndarray:
    """Depthwise causal conv over time. x [B, T, C], w [C, k] -> [B, T, C].

    k is tiny (4): unrolled shift-and-add fuses into the surrounding graph —
    the TPU answer to the reference's causal_conv1d CUDA ext
    (hf_kernels/causal_conv1d, SURVEY §2.6)."""
    B, T, C = x.shape
    xp = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    y = jnp.zeros_like(x)
    for j in range(k):
        y = y + xp[:, j : j + T, :] * w[None, None, :, j]
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _rms_noweight(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)).astype(
        x.dtype
    )


def mamba_mixer(
    spec: ModelSpec,
    mp: Params,
    h: jnp.ndarray,  # [B, T, hidden]
    cache: Optional[dict] = None,  # {"conv": [B, k-1, d_in], "ssm": [B, d_in, N]}
    prefix: str = "mixer",
    taps=None,
    tap_paths=frozenset(),
):
    """FalconMamba selective SSM (modeling_falcon_mamba.py:406 slow_forward):
    in_proj -> (x, gate); causal depthwise conv + silu; x_proj -> (dt, B, C)
    each RMS-normalized (falcon's b_c_dt rms, no weights); softplus(dt_proj);
    recurrence h <- exp(A dt) h + dt B x, y = C.h + D x, gated by silu(gate).

    Prefill runs the recurrence as one lax.scan over T; decode (T==1 with a
    cache) is a single update on the carried (conv, ssm) states — the
    mamba-family KV-cache analog."""
    B, T, D = h.shape
    d_in = spec.mamba_d_inner
    N = spec.mamba_d_state
    k = spec.mamba_d_conv
    dtr = spec.mamba_dt_rank

    _tap(taps, tap_paths, f"{prefix}.in_proj", h)
    proj = apply_linear(mp["in_proj"], h)  # [B, T, 2*d_in]
    x, gate = jnp.split(proj, 2, axis=-1)

    conv_w = jnp.asarray(mp["conv1d"]["weight"])[:, 0, :]  # [d_in, k]
    conv_b = mp["conv1d"].get("bias")
    if cache is not None and T == 1:
        # decode: sliding conv window from the cache
        window = jnp.concatenate([cache["conv"], x], axis=1)  # [B, k, d_in]
        xc = jnp.einsum("bkc,ck->bc", window.astype(jnp.float32),
                        conv_w.astype(jnp.float32))[:, None, :]
        if conv_b is not None:
            xc = xc + conv_b.astype(xc.dtype)
        xc = jax.nn.silu(xc).astype(h.dtype)
        cache = dict(cache, conv=window[:, 1:, :])
    else:
        xc = jax.nn.silu(
            _causal_conv1d(x, conv_w.astype(jnp.float32), conv_b, k)
        ).astype(h.dtype)
        if cache is not None:  # prefill into cache: keep last k-1 inputs
            pad = jnp.pad(x, ((0, 0), (max(k - 1 - T, 0), 0), (0, 0)))
            cache = dict(cache, conv=pad[:, -(k - 1):, :])

    _tap(taps, tap_paths, f"{prefix}.x_proj", xc)
    sp = apply_linear(mp["x_proj"], xc)  # [B, T, dtr + 2N]
    dt_r, Bm, Cm = jnp.split(sp, [dtr, dtr + N], axis=-1)
    if "dt_layernorm" in mp:  # jamba: WEIGHTED dt/B/C RMS norms
        dt_r = rms_norm(dt_r, mp["dt_layernorm"]["weight"], spec.rms_norm_eps)
        Bm = rms_norm(Bm, mp["b_layernorm"]["weight"], spec.rms_norm_eps)
        Cm = rms_norm(Cm, mp["c_layernorm"]["weight"], spec.rms_norm_eps)
    elif spec.mixer_rms_eps:  # falcon_mamba b_c_dt RMS (no weights)
        dt_r = _rms_noweight(dt_r, spec.mixer_rms_eps)
        Bm = _rms_noweight(Bm, spec.mixer_rms_eps)
        Cm = _rms_noweight(Cm, spec.mixer_rms_eps)
    _tap(taps, tap_paths, f"{prefix}.dt_proj", dt_r)
    dt = jax.nn.softplus(apply_linear(mp["dt_proj"], dt_r))  # [B, T, d_in]

    A = -jnp.exp(jnp.asarray(mp["A_log"]).astype(jnp.float32))  # [d_in, N]
    Dv = jnp.asarray(mp["D"]).astype(jnp.float32)  # [d_in]
    xf = xc.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    Bf = Bm.astype(jnp.float32)
    Cf = Cm.astype(jnp.float32)

    ssm0 = (
        cache["ssm"].astype(jnp.float32)
        if cache is not None
        else jnp.zeros((B, d_in, N), jnp.float32)
    )

    def step(ssm, t_in):
        x_t, dt_t, B_t, C_t = t_in  # [B,d_in], [B,d_in], [B,N], [B,N]
        dA = jnp.exp(A[None] * dt_t[:, :, None])  # [B, d_in, N]
        ssm = dA * ssm + (dt_t * x_t)[:, :, None] * B_t[:, None, :]
        y_t = jnp.einsum("bdn,bn->bd", ssm, C_t)
        return ssm, y_t

    xs = (
        xf.transpose(1, 0, 2), dtf.transpose(1, 0, 2),
        Bf.transpose(1, 0, 2), Cf.transpose(1, 0, 2),
    )
    ssm_f, ys = jax.lax.scan(step, ssm0, xs)
    y = ys.transpose(1, 0, 2) + xf * Dv[None, None, :]
    y = (y * jax.nn.silu(gate.astype(jnp.float32))).astype(h.dtype)
    if cache is not None:
        cache = dict(cache, ssm=ssm_f.astype(cache["ssm"].dtype))
    _tap(taps, tap_paths, f"{prefix}.out_proj", y)
    return apply_linear(mp["out_proj"], y), cache


def mamba_decoder_layer(
    spec: ModelSpec,
    lp: Params,
    h: jnp.ndarray,
    cache: Optional[dict] = None,
    taps=None,
    tap_paths=frozenset(),
):
    normed = rms_norm(h, lp["norm"]["weight"], spec.rms_norm_eps)
    mixer = mamba2_mixer if "dt_bias" in lp["mixer"] else mamba_mixer
    out, cache = mixer(
        spec, lp["mixer"], normed, cache, taps=taps, tap_paths=tap_paths
    )
    return h + out, cache


def init_mamba_cache(spec: ModelSpec, batch: int, dtype=jnp.bfloat16):
    if spec.mamba_n_heads:  # mamba2/SSD: conv covers x+B+C; per-head states
        conv_dim = spec.mamba_d_inner + 2 * spec.mamba_n_groups * spec.mamba_d_state
        hd = spec.mamba_d_inner // spec.mamba_n_heads
        return [
            {
                "conv": jnp.zeros((batch, spec.mamba_d_conv - 1, conv_dim), dtype),
                "ssm": jnp.zeros(
                    (batch, spec.mamba_n_heads, hd, spec.mamba_d_state),
                    jnp.float32,
                ),
            }
            for _ in range(spec.num_layers)
        ]
    return [
        {
            "conv": jnp.zeros(
                (batch, spec.mamba_d_conv - 1, spec.mamba_d_inner), dtype
            ),
            "ssm": jnp.zeros(
                (batch, spec.mamba_d_inner, spec.mamba_d_state), jnp.float32
            ),
        }
        for _ in range(spec.num_layers)
    ]


def longcat_moe(
    spec: ModelSpec,
    mp: Params,
    x: jnp.ndarray,  # [N, hidden]
    prefix: str = "mlp",
    taps=None,
    tap_paths=frozenset(),
):
    """Longcat shortcut MoE (modeling_longcat_flash.py:120-180): softmax
    scores + correction bias select top-k over routed + IDENTITY (zero
    compute) experts; weights are the raw scores * routed_scaling_factor.
    Identity expert slots contribute w*x directly."""
    cls = mp["router"]["classifier"]
    logits = x.astype(jnp.float32) @ jnp.asarray(
        cls["weight"], jnp.float32).T
    if "bias" in cls:
        logits = logits + jnp.asarray(cls["bias"], jnp.float32)
    scores = jax.nn.softmax(logits, axis=-1)
    bias = jnp.asarray(
        mp["router"]["e_score_correction_bias"], jnp.float32).reshape(-1)
    _, top_i = _topk(scores + bias[None, :], spec.num_experts_per_tok)
    top_w = jnp.take_along_axis(scores, top_i, axis=1)
    top_w = top_w * spec.routed_scaling_factor

    E = spec.num_experts
    n_routed = E - spec.zero_expert_num
    w_full = jnp.zeros((x.shape[0], E), jnp.float32)
    w_full = jax.vmap(lambda w, i, row: row.at[i].set(w))(top_w, top_i, w_full)
    out = jnp.zeros_like(x)
    for e in range(n_routed):
        we = w_full[:, e]
        routed = (we > 0).astype(x.dtype)
        if taps is not None:
            y = gated_mlp(
                spec, mp["experts"][e], x * routed[:, None],
                prefix=f"{prefix}.experts.{e}", taps=taps,
                tap_paths=tap_paths, row_mask=routed,
            )
        else:
            y = gated_mlp(spec, mp["experts"][e], x)
        out = out + y * we[:, None].astype(x.dtype)
    if spec.zero_expert_num:
        w_zero = jnp.sum(w_full[:, n_routed:], axis=1)
        out = out + x * w_zero[:, None].astype(x.dtype)
    return out


def longcat_decoder_layer(
    spec: ModelSpec,
    lp: Params,
    h: jnp.ndarray,
    cos,
    sin,
    attn_bias,
    cache: Optional[dict] = None,  # {"pos","k","v","k2","v2"}
    taps=None,
    tap_paths=frozenset(),
):
    """Longcat dual-sublayer layer (modeling_longcat_flash.py:413-500):
    attn0 -> (shortcut MoE of the post-attn0 norm) + dense mlp0 -> attn1 ->
    dense mlp1 + shortcut output. Two KV sub-caches per logical layer."""
    B, T, D = h.shape

    def sub(idx: int, hin, ckeys):
        c = None
        if cache is not None:
            c = {"pos": cache["pos"], "k": cache[ckeys[0]],
                 "v": cache[ckeys[1]]}
        out, c = mla_attention(
            spec, lp["self_attn"][idx], hin, cos, sin, attn_bias, c,
            prefix=f"self_attn.{idx}", taps=taps, tap_paths=tap_paths,
        )
        return out, c

    normed0 = rms_norm(h, lp["input_layernorm"][0]["weight"], spec.rms_norm_eps)
    attn0, c0 = sub(0, normed0, ("k", "v"))
    h = h + attn0
    normed1 = rms_norm(
        h, lp["post_attention_layernorm"][0]["weight"], spec.rms_norm_eps
    )
    x = normed1.reshape(B * T, D)
    shortcut = longcat_moe(
        spec, lp["mlp"], x, prefix="mlp", taps=taps, tap_paths=tap_paths,
    ).reshape(B, T, D)
    h = h + gated_mlp(
        spec, lp["mlps"][0], normed1, prefix="mlps.0",
        taps=taps, tap_paths=tap_paths,
    )
    normed2 = rms_norm(h, lp["input_layernorm"][1]["weight"], spec.rms_norm_eps)
    attn1, c1 = sub(1, normed2, ("k2", "v2"))
    h = h + attn1
    normed3 = rms_norm(
        h, lp["post_attention_layernorm"][1]["weight"], spec.rms_norm_eps
    )
    h = h + gated_mlp(
        spec, lp["mlps"][1], normed3, prefix="mlps.1",
        taps=taps, tap_paths=tap_paths,
    ) + shortcut
    if cache is not None:
        cache = dict(cache, k=c0["k"], v=c0["v"], k2=c1["k"], v2=c1["v"],
                     pos=c0["pos"])
    return h, cache


def falcon_h1_decoder_layer(
    spec: ModelSpec,
    lp: Params,
    h: jnp.ndarray,
    cos,
    sin,
    attn_bias,
    cache: Optional[dict] = None,
    taps=None,
    tap_paths=frozenset(),
):
    """Falcon-H1 layer (modeling_falcon_h1.py:1046-1135): mamba2 and
    attention run IN PARALLEL on the same normed input, summed with mup
    out-multipliers; gated MLP applies gate/down multipliers. One cache dict
    carries both KV and (conv, ssm) states."""
    at_in, at_out, _, ssm_out, g_m, d_m = spec.fh1_multipliers
    normed = sublayer_norm(spec, lp["input_layernorm"], h)
    mamba_out, cache = mamba2_mixer(
        spec, lp["mamba"], normed, cache, prefix="mamba",
        taps=taps, tap_paths=tap_paths,
    )
    attn_out, cache = attention(
        spec, lp["self_attn"], normed * at_in, cos, sin, attn_bias, cache,
        taps=taps, tap_paths=tap_paths,
    )
    h = h + mamba_out * ssm_out + attn_out * at_out
    normed2 = sublayer_norm(spec, lp["pre_ff_layernorm"], h)
    mp = lp["feed_forward"]
    _tap(taps, tap_paths, "feed_forward.gate_proj", normed2)
    _tap(taps, tap_paths, "feed_forward.up_proj", normed2)
    g = apply_linear(mp["gate_proj"], normed2) * g_m
    u = apply_linear(mp["up_proj"], normed2)
    inner = _act(spec.hidden_act)(g) * u
    _tap(taps, tap_paths, "feed_forward.down_proj", inner)
    return h + apply_linear(mp["down_proj"], inner) * d_m, cache


def minimax_lightning_attention(
    spec: ModelSpec,
    ap: Params,
    h: jnp.ndarray,  # [B, T, hidden] (already normed by the layer)
    cache: Optional[dict] = None,  # {"KV": [B, nh, hd, hd] f32}
    prefix: str = "self_attn",
    taps=None,
    tap_paths=frozenset(),
):
    """MiniMax lightning (linear) attention (modeling_minimax.py:118-262):
    silu(qkv_proj) per-head thirds, per-head exponential-decay linear
    recurrence KV <- exp(-slope)*KV + k v^T with layer-indexed slopes,
    full-width RMSNorm, sigmoid(output_gate(h)) gating, out_proj. The HF
    block-chunked prefill is the same operator; one lax.scan here. slope is
    read from the checkpoint buffer or derived from the loader-injected
    runtime ``_layer_idx``."""
    B, T, D = h.shape
    nh, hd = spec.num_heads, spec.head_dim
    _tap(taps, tap_paths, f"{prefix}.qkv_proj", h)
    _tap(taps, tap_paths, f"{prefix}.output_gate", h)
    qkv = jax.nn.silu(apply_linear(ap["qkv_proj"], h))
    qkv = qkv.reshape(B, T, nh, 3 * hd)
    q, k, v = (t.astype(jnp.float32)
               for t in jnp.split(qkv, 3, axis=-1))  # [B,T,nh,hd]

    if "slope_rate" in ap:  # persisted buffer
        slope = jnp.asarray(ap["slope_rate"], jnp.float32).reshape(nh)
    else:  # derive (get_slope_rate): base^(i+1) * layer factor
        idx = jnp.asarray(ap["_layer_idx"], jnp.float32)
        base = 1.0 / (2.0 ** (8.0 / nh))
        rate = base ** jnp.arange(1, nh + 1, dtype=jnp.float32)
        factor = 1.0 - idx / (spec.num_layers - 1 + 1e-5) + 1e-5
        slope = rate * factor
    ratio = jnp.exp(-slope)  # [nh]

    KV0 = (
        cache["KV"].astype(jnp.float32)
        if cache is not None
        else jnp.zeros((B, nh, hd, hd), jnp.float32)
    )

    def step(KV, t_in):
        q_t, k_t, v_t = t_in  # [B, nh, hd]
        KV = KV * ratio[None, :, None, None] + (
            k_t[..., :, None] * v_t[..., None, :]
        )
        y_t = jnp.einsum("bnk,bnkv->bnv", q_t, KV)
        return KV, y_t

    xs = (q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
          v.transpose(1, 0, 2, 3))
    KV_f, ys = jax.lax.scan(step, KV0, xs)
    y = ys.transpose(1, 0, 2, 3).reshape(B, T, nh * hd)
    if cache is not None:
        cache = dict(cache, KV=KV_f.astype(cache["KV"].dtype))

    y = rms_norm(y.astype(h.dtype), ap["norm"]["weight"], spec.rms_norm_eps)
    gate = jax.nn.sigmoid(
        apply_linear(ap["output_gate"], h).astype(jnp.float32)
    ).astype(h.dtype)
    y = gate * y
    _tap(taps, tap_paths, f"{prefix}.out_proj", y)
    return apply_linear(ap["out_proj"], y), cache


def minimax_decoder_layer(
    spec: ModelSpec,
    lp: Params,
    h: jnp.ndarray,
    cos,
    sin,
    attn_bias,
    cache: Optional[dict] = None,
    taps=None,
    tap_paths=frozenset(),
):
    """MiniMax layer (modeling_minimax.py:486-575): residual is the NORMED
    hidden, combined with per-kind alpha/beta factors."""
    fa_a, fa_b, la_a, la_b, m_a, m_b = spec.minimax_factors or (1.0,) * 6
    h1 = sublayer_norm(spec, lp["input_layernorm"], h)
    ap = lp["self_attn"]
    if "output_gate" in ap:  # lightning layer
        attn_out, cache = minimax_lightning_attention(
            spec, ap, h1, cache, taps=taps, tap_paths=tap_paths,
        )
        a, b = la_a, la_b
    else:
        attn_out, cache = attention(
            spec, ap, h1, cos, sin, attn_bias, cache,
            taps=taps, tap_paths=tap_paths,
        )
        a, b = fa_a, fa_b
    h2 = h1 * a + attn_out * b
    h3 = sublayer_norm(spec, lp["post_attention_layernorm"], h2)
    moe_out = moe_mlp(
        spec, lp["block_sparse_moe"], h3, prefix="block_sparse_moe",
        taps=taps, tap_paths=tap_paths,
    )
    return h3 * m_a + moe_out * m_b, cache


def _l2norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """FLA-style l2norm (modeling_qwen3_next.py:436): rsqrt(sum(x^2)+eps)."""
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def qwen3next_deltanet(
    spec: ModelSpec,
    mp: Params,
    h: jnp.ndarray,  # [B, T, hidden]
    cache: Optional[dict] = None,  # {"conv": [B,k-1,conv_dim], "S": [B,nv,hk,hv]}
    prefix: str = "linear_attn",
    taps=None,
    tap_paths=frozenset(),
):
    """Qwen3-Next GatedDeltaNet mixer (modeling_qwen3_next.py:564-776):
    in_proj_qkvz/-ba with per-k-head grouped ordering, causal depthwise
    conv + silu over [q|k|v], l2-normed q/k, gated delta rule recurrence
    S <- S*exp(g) + k (v - S k)^T beta, per-head gated RMSNorm with silu(z),
    out_proj. Prefill = one lax.scan over T (the reference's fla/causal-
    conv1d CUDA-ext territory, SURVEY §2.6); decode = single update on the
    carried (conv, S) states."""
    B, T, D = h.shape
    nk, nv = spec.linear_num_k_heads, spec.linear_num_v_heads
    hk, hv = spec.linear_k_head_dim, spec.linear_v_head_dim
    key_dim, value_dim = nk * hk, nv * hv
    grp = nv // nk
    k_sz = spec.mamba_d_conv
    conv_dim = 2 * key_dim + value_dim

    if "in_proj_qkv" in mp:
        # qwen3_5 / minicpmv4_6 / intern_s2 variant: SEPARATE deltanet
        # projections in flat [q | k | v] order (reference definitions/
        # qwen3_5.py tree: in_proj_qkv/-z/-b/-a replace fused qkvz/ba)
        for leaf in ("in_proj_qkv", "in_proj_z", "in_proj_b", "in_proj_a"):
            _tap(taps, tap_paths, f"{prefix}.{leaf}", h)
        qkv = apply_linear(mp["in_proj_qkv"], h)  # [B,T, 2*key + value]
        q = qkv[..., :key_dim].reshape(B, T, nk, hk)
        kk = qkv[..., key_dim : 2 * key_dim].reshape(B, T, nk, hk)
        v = qkv[..., 2 * key_dim :].reshape(B, T, nv, hv)
        z = apply_linear(mp["in_proj_z"], h).reshape(B, T, nv, hv)
        b = apply_linear(mp["in_proj_b"], h)  # [B,T,nv]
        a = apply_linear(mp["in_proj_a"], h)
    else:
        _tap(taps, tap_paths, f"{prefix}.in_proj_qkvz", h)
        _tap(taps, tap_paths, f"{prefix}.in_proj_ba", h)
        qkvz = apply_linear(mp["in_proj_qkvz"], h)  # [B,T, 2*key + 2*value]
        ba = apply_linear(mp["in_proj_ba"], h)  # [B,T, 2*nv]

        # grouped per-k-head ordering (fix_query_key_value_ordering)
        qkvz = qkvz.reshape(B, T, nk, 2 * hk + 2 * grp * hv)
        q = qkvz[..., :hk]  # [B,T,nk,hk]
        kk = qkvz[..., hk : 2 * hk]
        v = qkvz[..., 2 * hk : 2 * hk + grp * hv].reshape(B, T, nv, hv)
        z = qkvz[..., 2 * hk + grp * hv :].reshape(B, T, nv, hv)
        ba = ba.reshape(B, T, nk, 2 * grp)
        b = ba[..., :grp].reshape(B, T, nv)
        a = ba[..., grp:].reshape(B, T, nv)

    # causal depthwise conv + silu over the FLATTENED [q|k|v] channels
    mixed = jnp.concatenate(
        [q.reshape(B, T, key_dim), kk.reshape(B, T, key_dim),
         v.reshape(B, T, value_dim)], axis=-1,
    )
    conv_w = jnp.asarray(mp["conv1d"]["weight"])[:, 0, :]  # [conv_dim, k]
    conv_b = mp["conv1d"].get("bias")
    if cache is not None and T == 1:
        window = jnp.concatenate([cache["conv"], mixed], axis=1)  # [B,k,cd]
        xc = jnp.einsum("bkc,ck->bc", window.astype(jnp.float32),
                        conv_w.astype(jnp.float32))[:, None, :]
        if conv_b is not None:
            xc = xc + conv_b.astype(xc.dtype)
        xc = jax.nn.silu(xc).astype(h.dtype)
        cache = dict(cache, conv=window[:, 1:, :])
    else:
        xc = jax.nn.silu(
            _causal_conv1d(mixed, conv_w.astype(jnp.float32), conv_b, k_sz)
        ).astype(h.dtype)
        if cache is not None:
            pad = jnp.pad(mixed, ((0, 0), (max(k_sz - 1 - T, 0), 0), (0, 0)))
            cache = dict(cache, conv=pad[:, -(k_sz - 1):, :])

    qc = xc[..., :key_dim].reshape(B, T, nk, hk)
    kc = xc[..., key_dim : 2 * key_dim].reshape(B, T, nk, hk)
    vc = xc[..., 2 * key_dim :].reshape(B, T, nv, hv)

    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    g = -jnp.exp(jnp.asarray(mp["A_log"]).astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + jnp.asarray(mp["dt_bias"]).astype(jnp.float32)
    )  # [B,T,nv]
    if grp > 1:  # expand k-heads to v-heads
        qc = jnp.repeat(qc, grp, axis=2)
        kc = jnp.repeat(kc, grp, axis=2)

    qf = _l2norm(qc.astype(jnp.float32)) * (hk ** -0.5)
    kf = _l2norm(kc.astype(jnp.float32))
    vf = vc.astype(jnp.float32)

    S0 = (
        cache["S"].astype(jnp.float32)
        if cache is not None
        else jnp.zeros((B, nv, hk, hv), jnp.float32)
    )

    def step(S, t_in):
        q_t, k_t, v_t, g_t, b_t = t_in  # [B,nv,hk],[B,nv,hk],[B,nv,hv],[B,nv]x2
        S = S * jnp.exp(g_t)[:, :, None, None]
        kv = jnp.einsum("bnkv,bnk->bnv", S, k_t)
        delta = (v_t - kv) * b_t[:, :, None]
        S = S + k_t[..., :, None] * delta[..., None, :]
        y_t = jnp.einsum("bnkv,bnk->bnv", S, q_t)
        return S, y_t

    xs = (
        qf.transpose(1, 0, 2, 3), kf.transpose(1, 0, 2, 3),
        vf.transpose(1, 0, 2, 3), g.transpose(1, 0, 2),
        beta.transpose(1, 0, 2),
    )
    S_f, ys = jax.lax.scan(step, S0, xs)
    y = ys.transpose(1, 0, 2, 3)  # [B,T,nv,hv]
    if cache is not None:
        cache = dict(cache, S=S_f.astype(cache["S"].dtype))

    # per-head gated RMSNorm: norm -> weight -> * silu(z) (RMSNormGated)
    w = jnp.asarray(mp["norm"]["weight"]).astype(jnp.float32)
    var = jnp.mean(y * y, axis=-1, keepdims=True)
    y = (y * jax.lax.rsqrt(var + spec.rms_norm_eps)) * w
    y = (y * jax.nn.silu(z.astype(jnp.float32))).astype(h.dtype)
    y = y.reshape(B, T, value_dim)
    _tap(taps, tap_paths, f"{prefix}.out_proj", y)
    return apply_linear(mp["out_proj"], y), cache


def lfm2_shortconv(
    spec: ModelSpec,
    mp: Params,
    h: jnp.ndarray,
    cache: Optional[dict] = None,  # {"conv": [B, L-1, hidden]}
    prefix: str = "conv",
    taps=None,
    tap_paths=frozenset(),
):
    """LFM2 gated short convolution (modeling_lfm2.py:417 slow_forward):
    in_proj -> (B, C, x); depthwise causal conv over B*x; y = C * conv."""
    Bsz, T, D = h.shape
    k = spec.mamba_d_conv  # conv_L_cache
    _tap(taps, tap_paths, f"{prefix}.in_proj", h)
    bcx = apply_linear(mp["in_proj"], h)
    Bm, Cm, x = jnp.split(bcx, 3, axis=-1)
    bx = Bm * x
    conv_w = jnp.asarray(mp["conv"]["weight"])[:, 0, :]  # [D, k]
    conv_b = mp["conv"].get("bias")
    if cache is not None and T == 1:
        window = jnp.concatenate([cache["conv"], bx], axis=1)  # [B, k, D]
        y = jnp.einsum("bkc,ck->bc", window.astype(jnp.float32),
                       conv_w.astype(jnp.float32))[:, None, :]
        if conv_b is not None:
            y = y + conv_b.astype(y.dtype)
        y = y.astype(h.dtype)
        cache = dict(cache, conv=window[:, 1:, :])
    else:
        y = _causal_conv1d(bx, conv_w.astype(jnp.float32), conv_b, k).astype(
            h.dtype
        )
        if cache is not None:
            pad = jnp.pad(bx, ((0, 0), (max(k - 1 - T, 0), 0), (0, 0)))
            cache = dict(cache, conv=pad[:, -(k - 1):, :])
    y = Cm * y
    _tap(taps, tap_paths, f"{prefix}.out_proj", y)
    return apply_linear(mp["out_proj"], y), cache


def mamba2_mixer(
    spec: ModelSpec,
    mp: Params,
    h: jnp.ndarray,  # [B, T, hidden]
    cache: Optional[dict] = None,  # {"conv": [B, k-1, conv_dim], "ssm": [B,nh,hd,N]}
    prefix: str = "mixer",
    taps=None,
    tap_paths=frozenset(),
):
    """Mamba2 / SSD mixer (modeling_mamba2.py:457 torch_forward): fused
    in_proj -> [gate | x+B+C (conv'd together) | dt(per-head)]; scalar A per
    head; recurrence state[h] <- exp(dt_h A_h) state[h] + dt_h x_h (x) B,
    y = state . C + D x; gated RMSNorm before out_proj.

    Runs the recurrence as one lax.scan (mathematically identical to the
    chunked SSD formulation the reference's CUDA kernels implement; chunking
    is a long-prefill optimization, not a semantics change)."""
    B_, T, D = h.shape
    d_in = spec.mamba_d_inner
    N = spec.mamba_d_state
    k = spec.mamba_d_conv
    nh = spec.mamba_n_heads
    hd = d_in // nh
    ng = spec.mamba_n_groups
    conv_dim = d_in + 2 * ng * N

    if spec.falcon_h1:  # ssm_in mup (modeling_falcon_h1.py:593)
        h = h * spec.fh1_multipliers[2]
    _tap(taps, tap_paths, f"{prefix}.in_proj", h)
    proj = apply_linear(mp["in_proj"], h)
    if spec.falcon_h1:  # per-span mup vector (compute_mup_vector :1172)
        zm, xm, bm_, cm_, dtm = spec.fh1_ssm_multipliers
        mup = np.concatenate([
            np.full(d_in, zm, np.float32), np.full(d_in, xm, np.float32),
            np.full(ng * N, bm_, np.float32), np.full(ng * N, cm_, np.float32),
            np.full(nh, dtm, np.float32),
        ])
        proj = proj * jnp.asarray(mup, proj.dtype)
    gate, xbc, dt_raw = jnp.split(proj, [d_in, d_in + conv_dim], axis=-1)

    conv_w = jnp.asarray(mp["conv1d"]["weight"])[:, 0, :]  # [conv_dim, k]
    conv_b = mp["conv1d"].get("bias")
    if cache is not None and T == 1:
        window = jnp.concatenate([cache["conv"], xbc], axis=1)  # [B, k, cd]
        xc = jnp.einsum("bkc,ck->bc", window.astype(jnp.float32),
                        conv_w.astype(jnp.float32))[:, None, :]
        if conv_b is not None:
            xc = xc + conv_b.astype(xc.dtype)
        xbc_c = jax.nn.silu(xc).astype(h.dtype)
        cache = dict(cache, conv=window[:, 1:, :])
    else:
        xbc_c = jax.nn.silu(
            _causal_conv1d(xbc, conv_w.astype(jnp.float32), conv_b, k)
        ).astype(h.dtype)
        if cache is not None:
            pad = jnp.pad(xbc, ((0, 0), (max(k - 1 - T, 0), 0), (0, 0)))
            cache = dict(cache, conv=pad[:, -(k - 1):, :])

    x, Bm, Cm = jnp.split(xbc_c, [d_in, d_in + ng * N], axis=-1)
    A = -jnp.exp(jnp.asarray(mp["A_log"]).astype(jnp.float32))  # [nh]
    Dv = jnp.asarray(mp["D"]).astype(jnp.float32)  # [nh]
    dt_bias = jnp.asarray(mp["dt_bias"]).astype(jnp.float32)  # [nh]
    lo, hi = spec.mamba_dt_limit
    dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + dt_bias[None, None, :])
    if lo > 0.0 or hi != float("inf"):
        dt = jnp.clip(dt, lo, hi)

    rep = nh // ng
    xf = x.astype(jnp.float32).reshape(B_, T, nh, hd)
    Bf = jnp.repeat(
        Bm.astype(jnp.float32).reshape(B_, T, ng, N), rep, axis=2
    )
    Cf = jnp.repeat(
        Cm.astype(jnp.float32).reshape(B_, T, ng, N), rep, axis=2
    )

    ssm0 = (
        cache["ssm"].astype(jnp.float32)
        if cache is not None
        else jnp.zeros((B_, nh, hd, N), jnp.float32)
    )

    def step(ssm, t_in):
        x_t, dt_t, B_t, C_t = t_in  # [B,nh,hd] [B,nh] [B,nh,N] [B,nh,N]
        dA = jnp.exp(dt_t * A[None, :])  # [B, nh]
        ssm = (
            dA[:, :, None, None] * ssm
            + (dt_t[:, :, None] * x_t)[..., None] * B_t[:, :, None, :]
        )
        y_t = jnp.einsum("bhdn,bhn->bhd", ssm, C_t)
        return ssm, y_t

    xs = (
        xf.transpose(1, 0, 2, 3), dt.transpose(1, 0, 2),
        Bf.transpose(1, 0, 2, 3), Cf.transpose(1, 0, 2, 3),
    )
    ssm_f, ys = jax.lax.scan(step, ssm0, xs)
    y = ys.transpose(1, 0, 2, 3) + xf * Dv[None, None, :, None]
    y = y.reshape(B_, T, d_in)
    if "norm" not in mp:
        # falcon_h1 mamba_rms_norm=False: plain silu gating, no norm
        # (modeling_falcon_h1.py:978-981)
        y = (y * jax.nn.silu(gate.astype(jnp.float32))).astype(h.dtype)
        if cache is not None:
            cache = dict(cache, ssm=ssm_f.astype(cache["ssm"].dtype))
        _tap(taps, tap_paths, f"{prefix}.out_proj", y)
        return apply_linear(mp["out_proj"], y), cache
    w_norm = jnp.asarray(mp["norm"]["weight"]).astype(jnp.float32)
    if spec.mamba_norm_before_gate:
        # falcon_h1: PER-GROUP norm -> weight -> * silu(gate)
        # (FalconH1RMSNormGated, modeling_falcon_h1.py)
        yg = y.reshape(B_, T, ng, d_in // ng)
        yg = yg * jax.lax.rsqrt(
            jnp.mean(yg * yg, -1, keepdims=True) + spec.rms_norm_eps
        )
        yf = (yg * w_norm.reshape(ng, d_in // ng)).reshape(B_, T, d_in)
        y = (yf * jax.nn.silu(gate.astype(jnp.float32))).astype(h.dtype)
    else:
        # mamba2: gate first, FULL-width norm (MambaRMSNormGated,
        # modeling_mamba2.py:204)
        yf = y * jax.nn.silu(gate.astype(jnp.float32))
        yf = yf * jax.lax.rsqrt(
            jnp.mean(yf * yf, -1, keepdims=True) + spec.rms_norm_eps
        )
        y = (yf * w_norm).astype(h.dtype)
    if cache is not None:
        cache = dict(cache, ssm=ssm_f.astype(cache["ssm"].dtype))
    _tap(taps, tap_paths, f"{prefix}.out_proj", y)
    return apply_linear(mp["out_proj"], y), cache
