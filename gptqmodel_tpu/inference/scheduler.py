"""Continuous batching engine: pipelined slot scheduler over jitted step fns.

The reference delegates serving to vLLM/SGLang (gptqmodel/utils/vllm.py:139);
here continuous batching is first-class (SURVEY §7 step 5 — new design work):

- A fixed pool of B slots shares one static KV cache [B, Hkv, L, D] per
  layer; each slot has its own write position (per-row scatter writes in
  ``attention``), so sequences join and leave mid-flight without reshaping
  anything — steady state runs two compiled programs: ``prefill_slot`` (per
  prompt-length bucket) and a fused multi-step decode (or speculative
  verify) block.
- **The host is off the critical path** (round-5 redesign): the decode
  carries — ``token``/``pos``/``key_valid``/KV/``tokbuf`` — stay
  DEVICE-RESIDENT between blocks, and block *n+1* is dispatched BEFORE
  block *n*'s tokens are synced to the host (JAX async dispatch), so host
  stop-logic and admission lag exactly one block while the device never
  waits on the host. Tokens a request emits after its stop point are
  discarded and the slot's stale KV writes are reclaimed on release
  (key_valid row clear / prefill row overwrite) — per-row scatter writes
  past ``max_len`` are DROPPED by JAX scatter semantics, so overshoot is
  harmless by construction.
- Sampling (greedy / temperature / top-k / top-p / min_p) runs ON DEVICE
  inside the decode program (``inference.sampling.sample_tokens``) with
  per-slot knob arrays; only the sampled token ids cross to host.
- Speculative decoding (``spec_k``) uses in-graph prompt-lookup drafts
  (device-resident token history buffer) and REJECTION SAMPLING, so it
  composes with stochastic requests exactly: a draft ``d`` is accepted with
  probability ``p_target(d)`` (the draft proposal is a point mass, so the
  standard ``min(1, p/q)`` rule reduces to ``u < p(d)``); on rejection the
  emitted token is drawn from the renormalized residual ``p`` with ``d``
  zeroed. Greedy rows reduce to exact argmax-match acceptance (p one-hot),
  so greedy outputs stay bit-identical to plain decode. ``spec_k``
  composes with ``decode_block``: that many verify steps run inside ONE
  fused ``lax.scan`` program, one host RPC per block.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

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


@dataclass
class Request:
    request_id: int
    prompt_ids: np.ndarray  # [T]
    max_new_tokens: int = 128
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    eos_token_id: Optional[int] = None
    stream_cb: Optional[Callable[[int], None]] = None
    stop: Optional[list] = None  # decoded-text stop strings (server-side)
    # filled during processing
    output_ids: list = field(default_factory=list)
    logprobs: list = field(default_factory=list)  # chosen-token log P
    done: bool = False
    finish_reason: str = ""
    cancelled: bool = False
    _event: threading.Event = field(default_factory=threading.Event)

    def wait(self, timeout=None) -> "Request":
        self._event.wait(timeout)
        return self

    def cancel(self):
        """Request early termination (e.g. a server-side stop string was
        matched on the decoded text). Thread-safe: the engine releases the
        slot at its next collect; tokens already emitted stay emitted (the
        caller truncates its decoded text itself)."""
        self.cancelled = True


@dataclass
class _Inflight:
    """A dispatched-but-unsynced decode/verify block (device futures)."""

    kind: str  # "decode" | "spec"
    n: int  # scan steps in the block
    rows: list  # [(slot, Request)] active at dispatch time
    toks: Any  # [n, B] (decode) or [n, B, K1] (spec)
    lps: Any
    counts: Any = None  # [n, B] emitted-token counts (spec only)


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _pow2ceil(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _pow2floor(n: int) -> int:
    p = 1
    while p * 2 <= n:
        p *= 2
    return p


def _lookup_drafts(buf: jnp.ndarray, hist_len: jnp.ndarray, k: int,
                   max_ngram: int = 3) -> jnp.ndarray:
    """In-graph prompt lookup for ONE row (vmapped by the caller).

    Same semantics as :func:`inference.speculative.propose_lookup`
    (transformers' prompt_lookup_num_tokens idea): find the most recent
    earlier occurrence of the longest matching tail n-gram (n<=max_ngram)
    in ``buf[:hist_len]`` and propose the ``k`` tokens that followed it.
    Tokens sliced past ``hist_len`` are whatever the buffer holds —
    acceptance decides, so draft quality only affects speed, never
    outputs."""
    L = buf.shape[0]
    t = jnp.arange(L, dtype=jnp.int32)
    drafts = jnp.zeros((k,), jnp.int32)
    for n in range(1, max_ngram + 1):  # ascending: larger n overrides
        tail = jax.lax.dynamic_slice(
            buf, (jnp.maximum(hist_len - n, 0),), (n,))
        m = t <= hist_len - n - 1  # continuation must start inside history
        for j in range(n):
            m = m & jnp.roll(buf == tail[j], -j)
        pos_t = jnp.max(jnp.where(m, t, -1))
        ok = (pos_t >= 0) & (hist_len > n)
        start = jnp.clip(pos_t + n, 0, L - k)
        d_n = jax.lax.dynamic_slice(buf, (start,), (k,))
        drafts = jnp.where(ok, d_n, drafts)
    return drafts


class ContinuousBatchingEngine:
    def __init__(
        self,
        spec: ModelSpec,
        params: Any,
        max_slots: int = 8,
        max_len: int = 2048,
        dtype=jnp.bfloat16,
        eos_token_id: Optional[int] = None,
        seed: int = 0,
        kv_quant: bool = False,
        spec_k: int = 0,
        decode_block: int = 1,
        spec_min_accept: float = 0.35,
    ):
        """``spec_k`` > 0 enables prompt-lookup speculative decode steps
        (inference/speculative.py rationale: the k+1-token verify forward
        is ~free on weight-bound TPU decode). Rejection sampling makes it
        exact for stochastic requests too, so mixed greedy/sampled batches
        all ride the verify path. ``decode_block`` > 1 fuses that many
        decode (or verify) steps into ONE jitted ``lax.scan`` program —
        one host RPC per block. Independent of both, the engine pipelines
        host work against the device: see the module docstring.

        Speculation is ADAPTIVE (r5, measured: low-acceptance traffic at
        158 vs 457 tok/s without — logs/serve_r5_spec.log): when the EMA
        of accepted drafts per verify step drops below
        ``spec_min_accept``, the engine falls back to plain decode blocks
        for a cooldown window, then re-probes with one verify block.
        Outputs are unaffected (both paths are exact); only the schedule
        changes. Set ``spec_min_accept=0`` to force always-speculate."""
        self.spec = spec
        self.params = params
        self.B = max_slots
        self.L = max_len
        self.dtype = dtype
        self.eos_token_id = eos_token_id

        from gptqmodel_tpu.inference.engine import init_kv_cache

        self.caches = [
            {k: v for k, v in c.items() if k != "pos"}
            for c in init_kv_cache(spec, self.B, max_len, dtype, kv_quant)
        ]
        # device-resident decode carries (never synced on the hot path)
        self.key_valid = jnp.zeros((self.B, max_len), bool)
        self.token = jnp.zeros(self.B, jnp.int32)  # last sampled token
        self.pos = jnp.zeros(self.B, jnp.int32)  # next write/query position
        self.tokbuf = jnp.zeros((self.B, max_len), jnp.int32)  # id history
        self.slots: list[Optional[Request]] = [None] * self.B
        # per-slot sampler knobs (device-side sampling); empty slots stay
        # greedy (temp 0) so they never pay the stochastic branch
        self.temp = np.zeros(self.B, np.float32)
        self.topk = np.zeros(self.B, np.int32)
        self.topp = np.ones(self.B, np.float32)
        self.minp = np.zeros(self.B, np.float32)
        self._base_key = jax.random.PRNGKey(seed)
        self._draws = 0  # folds into the key: one fresh subkey per sample

        self._queue: list[Request] = []
        self._lock = threading.Lock()
        self._next_id = 0
        self._prefill_cache: dict[int, Any] = {}
        self._decode_multi_cache: dict[int, Any] = {}
        self._spec_multi_cache: dict[int, Any] = {}
        self._inflight: Optional[_Inflight] = None
        self._pending_first: list = []  # (slot, req, tok_fut, lp_fut)
        self._dispatches = 0  # RPC-count telemetry (serve bench artifact)
        self._dispatch_kinds = {"spec": 0, "decode": 0}
        self.spec_k = int(spec_k)
        if self.spec_k > 0 and any("k" not in c for c in self.caches):
            # recurrent blocks (mamba/linear/conv) have no positional KV to
            # roll back — speculation requires pure-attention caches
            self.spec_k = 0
        self.decode_block = max(1, int(decode_block))
        if self.decode_block > 1 and any("k" not in c for c in self.caches):
            # recurrent state can't discard post-stop writes post-hoc
            self.decode_block = 1
        self.spec_min_accept = float(spec_min_accept)
        self._spec_ema: Optional[float] = None  # accepted drafts / step
        self._spec_cooldown = 0  # decode-only blocks left before re-probe
        # recurrent state consumes EVERY prefill token sequentially, so
        # right-pad bucketing would pollute it (transformer.py mamba
        # prefill is exact for un-padded prompts) — such models prefill at
        # EXACT lengths (one compile per distinct prompt length)
        self._recurrent = any("k" not in c for c in self.caches)

    # ------------------------------------------------------------- sharding
    def shard(self, mesh, model_axis: str = "model"):
        """Tensor-parallel serving: place the KV caches on ``mesh`` (head
        dim sharded) and the small carries replicated. With params sharded
        by ``parallel.sharding.shard_params``, every engine program —
        prefill groups, fused decode blocks, speculative verify scans —
        is partitioned by GSPMD from its input shardings alone; outputs
        are oracle-exact (tests/test_sharded_engine.py) and the caches
        KEEP their sharding through the scan carries. kv_heads must
        divide the mesh axis (pad via tp_pad_dense otherwise)."""
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        for c in self.caches:
            for k in c:
                if k in ("k", "v", "k_s", "v_s"):
                    sp = P(None, model_axis)  # [B, Hkv, L, ...]
                else:  # recurrent state: replicate (small)
                    sp = P()
                c[k] = _jax.device_put(c[k], NamedSharding(mesh, sp))
        rep = NamedSharding(mesh, P())
        self.key_valid = _jax.device_put(self.key_valid, rep)
        self.token = _jax.device_put(self.token, rep)
        self.pos = _jax.device_put(self.pos, rep)
        self.tokbuf = _jax.device_put(self.tokbuf, rep)
        return self

    # ------------------------------------------------------------- jit fns
    def _make_prefill(self, T: int, kb: int):
        """Batched admission prefill: ``kb`` prompts (padded to bucket
        ``T``) prefill in ONE program and scatter into their slots.
        Prefill is weight-streaming-bound, so [kb, T] costs ~the same as
        [1, T] — a burst of admissions pays one pass over the weights
        instead of kb (r5; the reference delegates batching to vLLM).
        Dummy pad rows carry slot index B (out of range): every scatter
        for them is DROPPED by JAX semantics, so kb only has to bound the
        group size, not match it."""
        spec, L, dtype = self.spec, self.L, self.dtype
        from gptqmodel_tpu.inference.sampling import (
            chosen_logprobs, sample_tokens)

        @jax.jit
        def prefill(params, caches, key_valid, token, pos, tokbuf, ids,
                    true_lens, slots, base_key, draw, temp, topk, topp,
                    minp):
            # fresh per-group mini caches (zeros), BUCKET-length T not L:
            # the layer only writes positions 0..T-1, attention only needs
            # the prompt span, and the write-back scatters just [:T] — so
            # a [kb, T] prefill's KV traffic is prompt-proportional, not
            # kb*max_len (prefill overwrites the row's validity anyway,
            # so stale content past T never matters)
            mini = []
            for c in caches:
                entry = {"pos": jnp.int32(0)}
                for kk, buf in c.items():
                    if kk in ("k", "v", "k_s", "v_s"):  # positional dim 2
                        shp = (kb,) + buf.shape[1:2] + (T,) + buf.shape[3:]
                    else:  # recurrent state (conv/ssm/...): full copy
                        shp = (kb,) + buf.shape[1:]
                    entry[kk] = jnp.zeros(shp, buf.dtype)
                mini.append(entry)
            positions = jnp.arange(T)[None, :]
            cos, sin = rope_cos_sin(spec, positions)
            qi = jnp.arange(T)[None, :, None]
            ki = jnp.arange(T)[None, None, :]
            tl = true_lens[:, None, None]
            ok = (ki <= qi) & (ki < tl)  # [kb, T, T]
            ctx = {"cos": cos, "sin": sin,
                   "bias": jnp.where(ok, 0.0, _NEG)[:, None]}
            if has_sliding_layers(spec):
                ctx["cos_l"], ctx["sin_l"] = rope_cos_sin(spec, positions, local=True)
                ok_l = ok & (ki > qi - spec.sliding_window)
                ctx["bias_l"] = jnp.where(ok_l, 0.0, _NEG)[:, None]
            h = embed(spec, params, ids, dtype, positions)
            for i, lp in enumerate(model_layers(spec, params)):
                cos_i, sin_i, bias_i = layer_rope_bias(spec, i, ctx)
                h, mini[i] = any_decoder_layer(
                    spec, lp, h, cos_i, sin_i, bias_i, mini[i]
                )
            h = final_norm(spec, params, h)
            last = h[jnp.arange(kb), true_lens - 1][:, None]  # [kb, 1, H]
            logits = lm_logits(spec, params, last)[:, 0]  # [kb, V]
            for i, c in enumerate(caches):
                for kk, buf in c.items():
                    if kk in ("k", "v", "k_s", "v_s"):
                        c[kk] = buf.at[slots, :, 0:T].set(
                            mini[i][kk], unique_indices=True)
                    else:
                        c[kk] = buf.at[slots].set(
                            mini[i][kk], unique_indices=True)
            rows = jnp.arange(L)[None, :] < true_lens[:, None]
            key_valid = key_valid.at[slots].set(rows, unique_indices=True)
            toks = sample_tokens(
                logits, jax.random.fold_in(base_key, draw),
                temp, topk, topp, minp)  # [kb]
            lps = chosen_logprobs(logits, toks)
            token = token.at[slots].set(toks, unique_indices=True)
            pos = pos.at[slots].set(true_lens, unique_indices=True)
            hist = jnp.zeros((kb, L), jnp.int32)
            hist = jax.lax.dynamic_update_slice(hist, ids, (0, 0))
            hist = hist.at[jnp.arange(kb), true_lens].set(toks)
            tokbuf = tokbuf.at[slots].set(hist, unique_indices=True)
            return toks, lps, caches, key_valid, token, pos, tokbuf

        return prefill

    def _make_decode_multi(self, n: int):
        """``n`` fused decode steps in one compiled program (lax.scan).

        Per-step math matches the classic single decode step — same
        sampler, same key folding sequence (``fold_in(base_key, draw+s)``)
        — so outputs are token-identical to ``n`` single steps. Returns
        ([n, B] tokens, [n, B] logprobs, carries); one host RPC total.
        Rows whose request stops mid-block keep stepping on garbage; the
        host discards those tokens and the slot's stale KV is reclaimed on
        release (key_valid row cleared / prefill row overwrite). Writes at
        the clamped position L-1 only ever happen to rows already finished
        per host accounting."""
        spec, dtype = self.spec, self.dtype
        from gptqmodel_tpu.inference.sampling import (
            chosen_logprobs, sample_tokens)

        @jax.jit
        def decode_n(params, caches, key_valid, token, pos, tokbuf,
                     base_key, draw, temp, topk, topp, minp):
            B = token.shape[0]
            L = key_valid.shape[1]

            def body(carry, s):
                token, pos, key_valid, caches, tokbuf = carry
                key_valid = key_valid.at[jnp.arange(B), pos].set(True)
                cos, sin = rope_cos_sin(spec, pos[:, None])
                ctx = {"cos": cos, "sin": sin,
                       "bias": jnp.where(
                           key_valid, 0.0, _NEG)[:, None, None, :]}
                if has_sliding_layers(spec):
                    ctx["cos_l"], ctx["sin_l"] = rope_cos_sin(
                        spec, pos[:, None], local=True)
                    ki = jnp.arange(L)[None, :]
                    ok_l = key_valid & (
                        ki > pos[:, None] - spec.sliding_window)
                    ctx["bias_l"] = jnp.where(
                        ok_l, 0.0, _NEG)[:, None, None, :]
                h = embed(spec, params, token[:, None], dtype, pos[:, None])
                new_caches = []
                for i, lp in enumerate(model_layers(spec, params)):
                    c = dict(caches[i], pos=pos)
                    cos_i, sin_i, bias_i = layer_rope_bias(spec, i, ctx)
                    h, c = any_decoder_layer(
                        spec, lp, h, cos_i, sin_i, bias_i, c)
                    new_caches.append(
                        {k_: v_ for k_, v_ in c.items() if k_ != "pos"})
                h = final_norm(spec, params, h)
                logits = lm_logits(spec, params, h)[:, 0]
                toks = sample_tokens(
                    logits, jax.random.fold_in(base_key, draw + s),
                    temp, topk, topp, minp)
                lps = chosen_logprobs(logits, toks)
                pos = jnp.minimum(pos + 1, L - 1)
                tokbuf = tokbuf.at[jnp.arange(B), pos].set(toks)
                return (toks, pos, key_valid, new_caches, tokbuf), (toks, lps)

            carry, (toks_all, lps_all) = jax.lax.scan(
                body, (token, pos, key_valid, caches, tokbuf),
                jnp.arange(n, dtype=jnp.uint32))
            token, pos, key_valid, caches, tokbuf = carry
            return toks_all, lps_all, caches, key_valid, token, pos, tokbuf

        return decode_n

    def _make_spec_multi(self, S: int):
        """``S`` fused speculative verify steps in one compiled program.

        Each step: in-graph prompt-lookup drafts from the device-resident
        id history, a (k+1)-token verify forward, then REJECTION SAMPLING
        against the per-row warped target distribution
        (inference/sampling.warped_probs). The draft proposal is a point
        mass, so the standard speculative accept rule ``u < min(1,
        p(d)/q(d))`` is ``u < p(d)``; the rejection resample draws from
        ``p`` with the rejected draft zeroed (renormalized) and the bonus
        token (all k accepted) from ``p`` itself — exactly the target
        distribution per emitted position. Greedy rows (temp<=0) get a
        one-hot target: acceptance = exact argmax match, resample = the
        argmax, i.e. bit-identical to plain greedy decode.

        Returns per-step ([S, B, K1] tokens, [S, B] emitted counts a+1,
        [S, B, K1] logprobs) + carries. The host consumes ``counts[s,b]``
        tokens per row per step and discards the rest."""
        spec, dtype, k = self.spec, self.dtype, self.spec_k
        K1 = k + 1
        from gptqmodel_tpu.inference.sampling import (
            chosen_logprobs, warped_probs)

        @jax.jit
        def spec_n(params, caches, key_valid, token, pos, tokbuf, act,
                   base_key, draw, temp, topk, topp, minp):
            B = token.shape[0]
            L = key_valid.shape[1]
            bidx = jnp.arange(B)

            def body(carry, s):
                token, pos, key_valid, caches, tokbuf = carry
                drafts = jax.vmap(
                    lambda b, hl: _lookup_drafts(b, hl, k))(
                        tokbuf, pos + 1)  # [B, k]
                tokens = jnp.concatenate([token[:, None], drafts], axis=1)
                positions = pos[:, None] + jnp.arange(K1)[None, :]
                cos, sin = rope_cos_sin(spec, positions)
                ki = jnp.arange(L)[None, None, :]
                qj = jnp.arange(K1)[None, :, None]
                new_blk = (ki >= pos[:, None, None]) & (
                    ki <= pos[:, None, None] + qj)
                ok = key_valid[:, None, :] | new_blk  # [B, K1, L]
                ctx = {"cos": cos, "sin": sin,
                       "bias": jnp.where(ok, 0.0, _NEG)[:, None]}
                if has_sliding_layers(spec):
                    ctx["cos_l"], ctx["sin_l"] = rope_cos_sin(
                        spec, positions, local=True)
                    ok_l = ok & (ki > pos[:, None, None] + qj
                                 - spec.sliding_window)
                    ctx["bias_l"] = jnp.where(ok_l, 0.0, _NEG)[:, None]
                h = embed(spec, params, tokens, dtype, positions)
                new_caches = []
                for i, lp_ in enumerate(model_layers(spec, params)):
                    c = dict(caches[i], pos=pos)
                    cos_i, sin_i, bias_i = layer_rope_bias(spec, i, ctx)
                    h, c = any_decoder_layer(
                        spec, lp_, h, cos_i, sin_i, bias_i, c)
                    new_caches.append(
                        {k_: v_ for k_, v_ in c.items() if k_ != "pos"})
                h = final_norm(spec, params, h)
                logits = lm_logits(spec, params, h)  # [B, K1, V]
                V = logits.shape[-1]
                # committed-token KV validity (active rows only)
                key_valid = key_valid.at[bidx, pos].set(
                    key_valid[bidx, pos] | act)
                rep = lambda x: jnp.repeat(x, K1)
                p = warped_probs(
                    logits.reshape(B * K1, V), rep(temp), rep(topk),
                    rep(topp), rep(minp)).reshape(B, K1, V)
                kk = jax.random.fold_in(base_key, draw + s)
                k_acc, k_res = jax.random.split(kk)
                u = jax.random.uniform(k_acc, (B, k))
                pd = jnp.take_along_axis(
                    p[:, :k], drafts[..., None], axis=-1)[..., 0]  # [B, k]
                a = jnp.sum(jnp.cumprod(
                    (u < pd).astype(jnp.int32), axis=1), axis=1)  # [B] 0..k
                dmat = jnp.concatenate(
                    [drafts, jnp.zeros((B, 1), jnp.int32)], axis=1)
                # only position a's resample is ever emitted (j<a emits the
                # draft, j>a is discarded by the host), so gather THAT
                # row's residual and draw one [B, V] categorical — not
                # [B, K1, V] (full-vocab Gumbel bits are the cost)
                p_a = jnp.take_along_axis(
                    p, a[:, None, None], axis=1)[:, 0]  # [B, V]
                d_a = jnp.take_along_axis(dmat, a[:, None], axis=1)  # [B,1]
                zero_d = ((jnp.arange(V)[None, :] == d_a)
                          & (a[:, None] < k))  # bonus (a==k) keeps p intact
                pz = jnp.where(zero_d, 0.0, p_a)
                tot = jnp.sum(pz, axis=-1, keepdims=True)
                pz = jnp.where(tot > 0.0, pz, p_a)  # all-zero float guard
                res = jax.random.categorical(
                    k_res, jnp.log(pz), axis=-1).astype(jnp.int32)  # [B]
                jj = jnp.arange(K1, dtype=jnp.int32)[None, :]
                out = jnp.where(jj < a[:, None], dmat, res[:, None])
                lps = jax.vmap(chosen_logprobs)(logits, out)
                # accepted draft KV slots become valid
                ti = jnp.arange(L)[None, :]
                acc_mask = ((ti >= pos[:, None] + 1)
                            & (ti <= pos[:, None] + a[:, None])
                            & act[:, None])
                key_valid = key_valid | acc_mask
                # id history: emitted tokens at logical pos+1 .. pos+a+1;
                # masked writes land at index L and are DROPPED (OOB)
                widx = pos[:, None] + 1 + jj
                widx = jnp.where(
                    (jj <= a[:, None]) & act[:, None], widx, L)
                tokbuf = tokbuf.at[bidx[:, None], widx].set(out)
                new_tok = jnp.take_along_axis(out, a[:, None], axis=1)[:, 0]
                token = jnp.where(act, new_tok, token)
                pos = jnp.where(
                    act, jnp.minimum(pos + a + 1, L - 1), pos)
                return ((token, pos, key_valid, new_caches, tokbuf),
                        (out, a + 1, lps))

            carry, (toks_all, counts, lps_all) = jax.lax.scan(
                body, (token, pos, key_valid, caches, tokbuf),
                jnp.arange(S, dtype=jnp.uint32))
            token, pos, key_valid, caches, tokbuf = carry
            return (toks_all, counts, lps_all, caches, key_valid, token,
                    pos, tokbuf)

        return spec_n

    # ------------------------------------------------------------ user API
    def submit(
        self,
        prompt_ids,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        min_p: float = 0.0,
        stream_cb=None,
        stop=None,
    ) -> Request:
        with self._lock:
            req = Request(
                request_id=self._next_id,
                prompt_ids=np.asarray(prompt_ids, np.int32).reshape(-1),
                max_new_tokens=max_new_tokens,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                min_p=min_p,
                eos_token_id=self.eos_token_id,
                stream_cb=stream_cb,
                stop=stop,
            )
            self._next_id += 1
            self._queue.append(req)
            return req

    def has_work(self) -> bool:
        return (bool(self._queue) or any(s is not None for s in self.slots)
                or self._inflight is not None or bool(self._pending_first))

    def step(self) -> list[Request]:
        """One scheduler iteration, pipelined: dispatch block n+1 FIRST
        (on the device-resident carries — no host sync needed), then sync
        and process block n's tokens (stop logic lags one block; post-stop
        tokens are discarded), then collect last step's prefill tokens and
        admit queued requests into freed slots. Returns requests finished
        this step."""
        nxt = self._dispatch()
        finished = []
        if self._inflight is not None:
            finished += self._collect(self._inflight)
        self._inflight = nxt
        finished += self._collect_first()
        finished += self._admit_all()
        return finished

    def run_until_idle(self) -> None:
        while self.has_work():
            self.step()

    def generate(self, prompt_ids, **kw) -> list[int]:
        req = self.submit(prompt_ids, **kw)
        while not req.done:
            self.step()
        return req.output_ids

    # ------------------------------------------------------------ internals
    def _dispatch(self) -> Optional[_Inflight]:
        rows = [(i, s) for i, s in enumerate(self.slots) if s is not None]
        if not rows:
            return None
        # trim tail blocks: no row needs more steps than the largest
        # remaining budget (pow2-rounded to bound compiles at log2 variants)
        remaining = max(
            max(r.max_new_tokens - len(r.output_ids) for _, r in rows), 1)
        n = _pow2floor(min(self.decode_block, _pow2ceil(remaining)))
        knobs = (self._base_key, jnp.uint32(self._draws),
                 jnp.asarray(self.temp), jnp.asarray(self.topk),
                 jnp.asarray(self.topp), jnp.asarray(self.minp))
        self._dispatches += 1
        use_spec = self.spec_k > 0
        if use_spec and self._spec_cooldown > 0:
            self._spec_cooldown -= 1
            use_spec = False  # adaptive fallback; re-probe at cooldown end
        if use_spec:
            self._dispatch_kinds["spec"] += 1
            if n not in self._spec_multi_cache:
                self._spec_multi_cache[n] = self._make_spec_multi(n)
            act = np.zeros(self.B, bool)
            act[[i for i, _ in rows]] = True
            (toks, counts, lps, self.caches, self.key_valid, self.token,
             self.pos, self.tokbuf) = self._spec_multi_cache[n](
                self.params, self.caches, self.key_valid, self.token,
                self.pos, self.tokbuf, jnp.asarray(act), *knobs)
            self._draws += n
            return _Inflight("spec", n, rows, toks, lps, counts)
        self._dispatch_kinds["decode"] += 1
        if n not in self._decode_multi_cache:
            self._decode_multi_cache[n] = self._make_decode_multi(n)
        (toks, lps, self.caches, self.key_valid, self.token, self.pos,
         self.tokbuf) = self._decode_multi_cache[n](
            self.params, self.caches, self.key_valid, self.token,
            self.pos, self.tokbuf, *knobs)
        self._draws += n
        return _Inflight("decode", n, rows, toks, lps)

    def _collect(self, blk: _Inflight) -> list[Request]:
        toks = np.asarray(blk.toks)  # sync point: waits for block n only —
        lps = np.asarray(blk.lps)  # block n+1 is already running on device
        counts = np.asarray(blk.counts) if blk.counts is not None else None
        if blk.kind == "spec" and blk.rows and counts is not None:
            # adaptive speculation: EMA of accepted drafts per verify step
            # (counts = accepted + 1); low acceptance -> decode-only
            # cooldown, then a one-block re-probe
            a_mean = float(np.mean(
                counts[:, [s for s, _ in blk.rows]])) - 1.0
            self._spec_ema = (a_mean if self._spec_ema is None
                              else 0.5 * self._spec_ema + 0.5 * a_mean)
            if (self.spec_min_accept > 0
                    and self._spec_ema < self.spec_min_accept):
                self._spec_cooldown = 16
                self._spec_ema = None  # fresh estimate at the next probe
        finished = []
        for slot, req in blk.rows:
            if self.slots[slot] is not req:  # released/re-admitted: discard
                continue
            if req.cancelled:
                self._release(slot, req, "stop")
                finished.append(req)
                continue
            stopped = False
            for s in range(blk.n):
                emit = ([int(toks[s, slot])] if counts is None else
                        [int(x) for x in
                         toks[s, slot, :int(counts[s, slot])]])
                src = (lps[s, slot] if counts is None
                       else lps[s, slot, :len(emit)])
                for tok, lp in zip(
                        emit, np.atleast_1d(np.asarray(src, np.float64))):
                    req.logprobs.append(float(lp))
                    self._emit(req, tok)
                    eos = (req.eos_token_id is not None
                           and tok == req.eos_token_id)
                    if eos or len(req.output_ids) >= req.max_new_tokens:
                        self._release(slot, req,
                                      "stop" if eos else "length")
                        finished.append(req)
                        stopped = True
                        break
                if stopped:
                    break
        return finished

    def _collect_first(self) -> list[Request]:
        """Sync prefill-sampled tokens dispatched LAST step (the prefill
        runs right after the block synced above, so this never waits on
        the just-dispatched block)."""
        pending, self._pending_first = self._pending_first, []
        finished = []
        for slot, req, tok_fut, lp_fut in pending:
            if req.cancelled:
                self._release(slot, req, "stop")
                finished.append(req)
                continue
            tok = int(tok_fut)
            req.logprobs.append(float(lp_fut))
            self._emit(req, tok)
            eos = req.eos_token_id is not None and tok == req.eos_token_id
            if eos or len(req.output_ids) >= req.max_new_tokens:
                self._release(slot, req, "stop" if eos else "length")
                finished.append(req)
        return finished

    def _admit_all(self) -> list[Request]:
        """Admit queued requests into every free slot (FIFO), BATCHED:
        the whole group prefills in one [kb, T] program (one pass over
        the weights for a burst of admissions). Bounded by the queue
        length at entry, so a concurrent submitter that keeps the queue
        non-empty with finish-at-prefill requests cannot starve decode
        (review finding r4)."""
        finished = []
        group: list[tuple[int, Request]] = []
        with self._lock:
            budget = len(self._queue)
        while budget > 0:
            budget -= 1
            with self._lock:
                if not self._queue:
                    break
                free = [i for i, s in enumerate(self.slots)
                        if s is None and not any(g[0] == i for g in group)]
                if not free:
                    break
                req = self._queue.pop(0)
            T_true = len(req.prompt_ids)
            if T_true + req.max_new_tokens > self.L:
                req.done = True
                req.finish_reason = "length_exceeded"
                req._event.set()
                finished.append(req)
                continue
            group.append((free[0], req))
        if not group:
            return finished
        # batch SAME-BUCKET admissions, width capped so the group stays in
        # the weight-streaming-bound regime (kb*T <= ~512 tokens — beyond
        # that prefill turns compute-bound and batching stops being free);
        # the (bucket -> width) mapping is FIXED, so compile count stays
        # one program per bucket and no (T, k) combo compiles mid-run
        by_bucket: dict[int, list] = {}
        for slot, req in group:
            Tb = (len(req.prompt_ids) if self._recurrent
                  else min(_bucket(len(req.prompt_ids)), self.L))
            by_bucket.setdefault(Tb, []).append((slot, req))
        for Tb, items in by_bucket.items():
            kb = max(1, min(self.B, 512 // Tb))
            for c0 in range(0, len(items), kb):
                self._prefill_group(Tb, kb, items[c0:c0 + kb])
        return finished

    def _prefill_group(self, Tb: int, kb: int, items: list):
        ids = np.zeros((kb, Tb), np.int32)
        true_lens = np.ones(kb, np.int32)
        # dummy pad rows get DISTINCT out-of-range slots (B, B+1, ...):
        # every scatter for them is dropped (unique_indices stays honest)
        slots_arr = np.arange(self.B, self.B + kb, dtype=np.int32)
        temp = np.zeros(kb, np.float32)
        topk = np.zeros(kb, np.int32)
        topp = np.ones(kb, np.float32)
        minp = np.zeros(kb, np.float32)
        for r_i, (slot, req) in enumerate(items):
            T_true = len(req.prompt_ids)
            ids[r_i, :T_true] = req.prompt_ids
            true_lens[r_i] = T_true
            slots_arr[r_i] = slot
            temp[r_i] = req.temperature
            topk[r_i] = req.top_k
            topp[r_i] = req.top_p
            minp[r_i] = req.min_p
            self.temp[slot] = req.temperature
            self.topk[slot] = req.top_k
            self.topp[slot] = req.top_p
            self.minp[slot] = req.min_p
        if (Tb, kb) not in self._prefill_cache:
            self._prefill_cache[(Tb, kb)] = self._make_prefill(Tb, kb)
        (toks, lps, self.caches, self.key_valid, self.token,
         self.pos, self.tokbuf) = self._prefill_cache[(Tb, kb)](
            self.params, self.caches, self.key_valid, self.token,
            self.pos, self.tokbuf, jnp.asarray(ids),
            jnp.asarray(true_lens), jnp.asarray(slots_arr),
            self._base_key, jnp.uint32(self._draws),
            jnp.asarray(temp), jnp.asarray(topk), jnp.asarray(topp),
            jnp.asarray(minp),
        )
        self._draws += 1
        for r_i, (slot, req) in enumerate(items):
            self.slots[slot] = req
            # first-token stop check happens at NEXT step's collect (the
            # scalar future must not force a wait on the inflight block)
            self._pending_first.append((slot, req, toks[r_i], lps[r_i]))

    def _release(self, slot: int, req: Request, reason: str):
        req.done = True
        req.finish_reason = reason
        req._event.set()
        self.slots[slot] = None
        # lazy clear applies AFTER any already-dispatched block's updates,
        # reclaiming its post-stop writes; prefill overwrites the row fully
        self.key_valid = self.key_valid.at[slot].set(False)
        self.temp[slot], self.topk[slot] = 0.0, 0
        self.topp[slot], self.minp[slot] = 1.0, 0.0

    def _emit(self, req: Request, tok: int):
        req.output_ids.append(int(tok))
        if req.stream_cb:
            req.stream_cb(int(tok))
