"""Continuous batching engine: slot-based scheduler over jitted step fns.

The reference delegates serving to vLLM/SGLang (gptqmodel/utils/vllm.py:139);
here continuous batching is first-class (SURVEY §7 step 5 — new design work):

- A fixed pool of B slots shares one static KV cache [B, Hkv, L, D] per
  layer; each slot has its own logical/physical position (per-row scatter
  writes in ``attention``), so sequences join and leave mid-flight without
  reshaping anything — only TWO compiled programs run steady-state:
  ``prefill_slot`` (per prompt-length bucket) and ``decode_all``.
- Prompts are padded up to power-of-two buckets to bound compile count.
- Sampling (greedy / temperature / top-k / top-p) runs ON DEVICE inside the
  decode program (``inference.sampling.sample_tokens``) with per-slot knob
  arrays, so heterogeneous requests share one compiled step and only the
  sampled token ids [B] cross to host — the host keeps stop logic only.
  (The reference inherits the same property from HF ``generate``,
  reference gptqmodel/models/base.py:1464.)
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
    # filled during processing
    output_ids: list = field(default_factory=list)
    logprobs: list = field(default_factory=list)  # chosen-token log P
    done: bool = False
    finish_reason: str = ""
    _event: threading.Event = field(default_factory=threading.Event)

    def wait(self, timeout=None) -> "Request":
        self._event.wait(timeout)
        return self


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


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
    ):
        """``spec_k`` > 0 enables prompt-lookup speculative decode steps
        (inference/speculative.py rationale: the k+1-token verify forward
        is ~free on weight-bound TPU decode). Used whenever every ACTIVE
        request is greedy; batches containing sampled requests fall back
        to the normal 1-token step, so outputs never change — only the
        number of weight-streaming passes does. Per-slot write pointers
        reclaim rejected-draft cache slots automatically (no max_len
        headroom needed, unlike the standalone speculative_generate).

        ``decode_block`` > 1 fuses that many decode steps into ONE jitted
        ``lax.scan`` program, so the host pays one dispatch RPC per block
        instead of per token (BENCH_SERVE_r04 measured ~35 ms tunnel RPC
        vs a 5.8 ms device step — block=8 cuts the host-RPC share 8x).
        Stop logic stays on host, applied post-hoc: tokens a request
        emits after its EOS/max_new point are discarded, and the slot's
        stale KV writes are reclaimed on release exactly like the
        speculative path's rejected drafts. Admission happens at block
        boundaries (worst-case added queueing latency = one block)."""
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
        self.key_valid = jnp.zeros((self.B, max_len), bool)
        self.pos = np.zeros(self.B, np.int32)  # next write/query position
        self.slots: list[Optional[Request]] = [None] * self.B
        self.last_token = np.zeros(self.B, np.int32)
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
        self._decode_fn = self._make_decode()
        self.spec_k = int(spec_k)
        if self.spec_k > 0 and any("k" not in c for c in self.caches):
            # recurrent blocks (mamba/linear/conv) have no positional KV to
            # roll back — speculation requires pure-attention caches
            self.spec_k = 0
        self.history: list[Optional[list]] = [None] * self.B
        self._verify_fn = (self._make_verify(self.spec_k + 1)
                           if self.spec_k > 0 else None)
        self.decode_block = max(1, int(decode_block))
        if self.decode_block > 1 and any("k" not in c for c in self.caches):
            # recurrent state can't discard post-stop writes post-hoc
            self.decode_block = 1
        self._decode_multi_cache: dict[int, Any] = {}

    # ------------------------------------------------------------- jit fns
    def _make_prefill(self, T: int):
        spec, L, dtype = self.spec, self.L, self.dtype
        from gptqmodel_tpu.inference.sampling import (
            chosen_logprobs, sample_tokens)

        @jax.jit
        def prefill(params, caches, key_valid, ids, true_len, slot,
                    base_key, draw, temp, topk, topp, minp):
            # mini-cache view for the slot (generic over int8-KV scale keys)
            mini = []
            for c in caches:
                entry = {"pos": jnp.int32(0)}
                for kk, buf in c.items():
                    entry[kk] = jax.lax.dynamic_slice(
                        buf, (slot,) + (0,) * (buf.ndim - 1), (1,) + buf.shape[1:]
                    )
                mini.append(entry)
            positions = jnp.arange(T)[None, :]
            cos, sin = rope_cos_sin(spec, positions)
            qi = jnp.arange(T)[:, None]
            ki = jnp.arange(L)[None, :]
            ok = (ki <= qi) & (ki < true_len)
            ctx = {"cos": cos, "sin": sin,
                   "bias": jnp.where(ok, 0.0, _NEG)[None, None]}
            if has_sliding_layers(spec):
                ctx["cos_l"], ctx["sin_l"] = rope_cos_sin(spec, positions, local=True)
                ok_l = ok & (ki > qi - spec.sliding_window)
                ctx["bias_l"] = jnp.where(ok_l, 0.0, _NEG)[None, None]
            h = embed(spec, params, ids, dtype, positions)
            for i, lp in enumerate(model_layers(spec, params)):
                cos_i, sin_i, bias_i = layer_rope_bias(spec, i, ctx)
                h, mini[i] = any_decoder_layer(
                    spec, lp, h, cos_i, sin_i, bias_i, mini[i]
                )
            h = final_norm(spec, params, h)
            last = jax.lax.dynamic_slice(h, (0, true_len - 1, 0), (1, 1, h.shape[-1]))
            logits = lm_logits(spec, params, last)[0, 0]
            for i, c in enumerate(caches):
                for kk, buf in c.items():
                    c[kk] = jax.lax.dynamic_update_slice(
                        buf, mini[i][kk], (slot,) + (0,) * (buf.ndim - 1)
                    )
            row = jnp.arange(L) < true_len
            key_valid = jax.lax.dynamic_update_slice(
                key_valid, row[None, :], (slot, 0)
            )
            tok = sample_tokens(
                logits[None], jax.random.fold_in(base_key, draw),
                temp[None], topk[None], topp[None], minp[None],
            )[0]
            lp = chosen_logprobs(logits[None], tok[None])[0]
            return tok, lp, caches, key_valid

        return prefill

    def _make_decode(self):
        spec, dtype = self.spec, self.dtype
        from gptqmodel_tpu.inference.sampling import (
            chosen_logprobs, sample_tokens)

        @jax.jit
        def decode(params, caches, key_valid, token, pos,
                   base_key, draw, temp, topk, topp, minp):
            B = token.shape[0]
            key_valid = key_valid.at[jnp.arange(B), pos].set(True)
            cos, sin = rope_cos_sin(spec, pos[:, None])
            ctx = {"cos": cos, "sin": sin,
                   "bias": jnp.where(key_valid, 0.0, _NEG)[:, None, None, :]}
            if has_sliding_layers(spec):
                ctx["cos_l"], ctx["sin_l"] = rope_cos_sin(spec, pos[:, None], local=True)
                ki = jnp.arange(key_valid.shape[1])[None, :]
                ok_l = key_valid & (ki > pos[:, None] - spec.sliding_window)
                ctx["bias_l"] = jnp.where(ok_l, 0.0, _NEG)[:, None, None, :]
            h = embed(spec, params, token[:, None], dtype, pos[:, None])
            new_caches = []
            for i, lp in enumerate(model_layers(spec, params)):
                c = dict(caches[i], pos=pos)
                cos_i, sin_i, bias_i = layer_rope_bias(spec, i, ctx)
                h, c = any_decoder_layer(spec, lp, h, cos_i, sin_i, bias_i, c)
                new_caches.append({k_: v_ for k_, v_ in c.items() if k_ != "pos"})
            h = final_norm(spec, params, h)
            logits = lm_logits(spec, params, h)[:, 0]
            toks = sample_tokens(
                logits, jax.random.fold_in(base_key, draw), temp, topk, topp,
                minp,
            )
            lps = chosen_logprobs(logits, toks)
            return toks, lps, new_caches, key_valid

        return decode

    def _make_decode_multi(self, n: int):
        """``n`` fused decode steps in one compiled program (lax.scan).

        Identical per-step math to ``_make_decode`` — same sampler, same
        key folding sequence (``fold_in(base_key, draw + s)``) — so
        outputs are token-identical to ``n`` single steps. Returns
        ([n, B] tokens, [n, B] logprobs, caches, key_valid); one host
        RPC total. Rows whose request stops mid-block keep stepping on
        garbage; the host discards those tokens and the slot's stale KV
        is reclaimed on release (key_valid row cleared / prefill row
        overwrite), the same tolerance the 1-step path already relies on
        for free slots."""
        spec, dtype = self.spec, self.dtype
        from gptqmodel_tpu.inference.sampling import (
            chosen_logprobs, sample_tokens)

        @jax.jit
        def decode_n(params, caches, key_valid, token, pos,
                     base_key, draw, temp, topk, topp, minp):
            B = token.shape[0]
            L = key_valid.shape[1]

            def body(carry, s):
                token, pos, key_valid, caches = carry
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
                # free/finished rows may march past L; clamp so their
                # (discarded) scatter targets stay in range — active rows
                # never reach the clamp (the host caps n at L - max(pos))
                pos = jnp.minimum(pos + 1, L - 1)
                return (toks, pos, key_valid, new_caches), (toks, lps)

            carry, (toks_all, lps_all) = jax.lax.scan(
                body, (token, pos, key_valid, caches),
                jnp.arange(n, dtype=jnp.uint32))
            _, _, key_valid, caches = carry
            return toks_all, lps_all, caches, key_valid

        return decode_n

    def _decode_multi_step(self, active: list[int]) -> list["Request"]:
        # largest power-of-two block that (a) fits the configured block,
        # (b) cannot push an ACTIVE row's write pointer past max_len
        # (pow2 rounding bounds the compile count at log2(block) variants)
        room = self.L - int(self.pos[np.asarray(active)].max())
        n = 1
        while n * 2 <= min(self.decode_block, room):
            n *= 2
        if n <= 1:
            return self._decode_single_step(active)
        if n not in self._decode_multi_cache:
            self._decode_multi_cache[n] = self._make_decode_multi(n)
        toks, lps, self.caches, self.key_valid = self._decode_multi_cache[n](
            self.params, self.caches, self.key_valid,
            jnp.asarray(self.last_token), jnp.asarray(self.pos),
            self._base_key, jnp.uint32(self._draws),
            jnp.asarray(self.temp), jnp.asarray(self.topk),
            jnp.asarray(self.topp), jnp.asarray(self.minp),
        )
        self._draws += n
        toks = np.asarray(toks)  # [n, B]
        lps = np.asarray(lps)
        finished = []
        for i in active:
            req = self.slots[i]
            stopped = False
            for j in range(n):
                tok = int(toks[j, i])
                req.logprobs.append(float(lps[j, i]))
                self._emit(req, tok)
                if self.history[i] is not None:
                    self.history[i].append(tok)
                eos = (req.eos_token_id is not None
                       and tok == req.eos_token_id)
                if eos or len(req.output_ids) >= req.max_new_tokens:
                    req.done = True
                    req.finish_reason = "stop" if eos else "length"
                    req._event.set()
                    finished.append(req)
                    self.slots[i] = None
                    self.history[i] = None
                    self.key_valid = self.key_valid.at[i].set(False)
                    self.temp[i], self.topk[i] = 0.0, 0
                    self.topp[i], self.minp[i] = 1.0, 0.0
                    stopped = True
                    break  # tokens past the stop point are discarded
            if not stopped:
                self.pos[i] += n
                self.last_token[i] = int(toks[n - 1, i])
        return finished

    def _make_verify(self, K1: int):
        """Speculative verify: per-slot (k+1)-token block forward. Returns
        (preds [B, K1] argmax, logprobs [B, K1], caches, key_valid) —
        key_valid marks only each row's committed slot; the host marks
        accepted draft slots after comparing."""
        spec, dtype = self.spec, self.dtype
        from gptqmodel_tpu.inference.sampling import chosen_logprobs

        @jax.jit
        def verify(params, caches, key_valid, tokens, pos, active):
            B = tokens.shape[0]
            L = key_valid.shape[1]
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
            for i, lp in enumerate(model_layers(spec, params)):
                c = dict(caches[i], pos=pos)
                cos_i, sin_i, bias_i = layer_rope_bias(spec, i, ctx)
                h, c = any_decoder_layer(spec, lp, h, cos_i, sin_i, bias_i, c)
                new_caches.append(
                    {k_: v_ for k_, v_ in c.items() if k_ != "pos"})
            h = final_norm(spec, params, h)
            logits = lm_logits(spec, params, h)  # [B, K1, V]
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            lps = jax.vmap(chosen_logprobs)(logits, preds)
            # mark the committed-token slot valid for ACTIVE rows only —
            # free slots must keep an all-False mask
            B_ = jnp.arange(B)
            key_valid = key_valid.at[B_, pos].set(
                key_valid[B_, pos] | active)
            return preds, lps, new_caches, key_valid

        return verify

    def _verify_step(self, active: list[int]) -> list["Request"]:
        from gptqmodel_tpu.inference.speculative import propose_lookup

        k = self.spec_k
        drafts = np.zeros((self.B, k), np.int32)
        for i in active:
            drafts[i] = propose_lookup(self.history[i], k)
        tokens = np.concatenate(
            [self.last_token[:, None], drafts], axis=1)
        act_mask = np.zeros(self.B, bool)
        act_mask[active] = True
        preds, lps, self.caches, self.key_valid = self._verify_fn(
            self.params, self.caches, self.key_valid,
            jnp.asarray(tokens), jnp.asarray(self.pos),
            jnp.asarray(act_mask))
        preds = np.asarray(preds)
        lps = np.asarray(lps)
        finished = []
        acc_rows = np.zeros((self.B, self.key_valid.shape[1]), bool)
        for i in active:
            req = self.slots[i]
            a = 0
            while a < k and drafts[i, a] == preds[i, a]:
                a += 1
            # mark accepted draft KV slots valid; rejected slots will be
            # overwritten (the per-slot pointer moves back over them)
            acc_rows[i, self.pos[i] + 1:self.pos[i] + 1 + a] = True
            stop_at = None
            for j in range(a + 1):  # a accepted drafts + 1 bonus token
                tok = int(preds[i, j])
                req.logprobs.append(float(lps[i, j]))
                self._emit(req, tok)
                self.history[i].append(tok)
                eos = (req.eos_token_id is not None
                       and tok == req.eos_token_id)
                if eos or len(req.output_ids) >= req.max_new_tokens:
                    req.done = True
                    req.finish_reason = "stop" if eos else "length"
                    stop_at = j
                    break
            if stop_at is not None:
                req._event.set()
                finished.append(req)
                self.slots[i] = None
                self.history[i] = None
                self.key_valid = self.key_valid.at[i].set(False)
                acc_rows[i] = False
                self.temp[i], self.topk[i], self.topp[i] = 0.0, 0, 1.0
                self.minp[i] = 0.0
                continue
            self.pos[i] += a + 1
            self.last_token[i] = int(preds[i, a])
        self.key_valid = jnp.logical_or(
            self.key_valid, jnp.asarray(acc_rows))
        return finished

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
            )
            self._next_id += 1
            self._queue.append(req)
            return req

    def has_work(self) -> bool:
        return bool(self._queue) or any(s is not None for s in self.slots)

    def step(self) -> list[Request]:
        """One scheduler iteration: admit pending requests into every free
        slot (FIFO), then decode all active slots. Returns requests
        finished this step. Filling all slots per step matters most with
        ``decode_block``: one-admission-per-step would leave slots idle a
        whole block per queued request."""
        while self._admit():
            pass
        return self._decode_step()

    def run_until_idle(self) -> None:
        while self.has_work():
            self.step()

    def generate(self, prompt_ids, **kw) -> list[int]:
        req = self.submit(prompt_ids, **kw)
        while not req.done:
            self.step()
        return req.output_ids

    # ------------------------------------------------------------ internals
    def _admit(self) -> bool:
        """Admit ONE queued request (prefill + slot fill). Returns True if
        it made progress (a request was admitted or finished at prefill),
        False when the queue is empty or no slot is free."""
        with self._lock:
            if not self._queue:
                return False
            free = [i for i, s in enumerate(self.slots) if s is None]
            if not free:
                return False
            req = self._queue.pop(0)
        slot = free[0]
        T_true = len(req.prompt_ids)
        if T_true + req.max_new_tokens > self.L:
            req.done = True
            req.finish_reason = "length_exceeded"
            req._event.set()
            return True
        Tb = _bucket(T_true)
        if Tb > self.L:
            Tb = self.L
        ids = np.zeros((1, Tb), np.int32)
        ids[0, :T_true] = req.prompt_ids
        if Tb not in self._prefill_cache:
            self._prefill_cache[Tb] = self._make_prefill(Tb)
        self.temp[slot] = req.temperature
        self.topk[slot] = req.top_k
        self.topp[slot] = req.top_p
        self.minp[slot] = req.min_p
        tok_dev, lp_dev, self.caches, self.key_valid = self._prefill_cache[Tb](
            self.params, self.caches, self.key_valid, jnp.asarray(ids),
            jnp.int32(T_true), jnp.int32(slot),
            self._base_key, jnp.uint32(self._draws),
            jnp.float32(req.temperature), jnp.int32(req.top_k),
            jnp.float32(req.top_p), jnp.float32(req.min_p),
        )
        self._draws += 1
        tok = int(tok_dev)
        req.logprobs.append(float(lp_dev))
        self._emit(req, tok)
        # the prefill-sampled token must honor stop conditions too (eos as
        # FIRST token, or max_new_tokens == 1) — review finding r4
        eos = req.eos_token_id is not None and tok == req.eos_token_id
        if eos or len(req.output_ids) >= req.max_new_tokens:
            req.done = True
            req.finish_reason = "stop" if eos else "length"
            req._event.set()
            self.temp[slot], self.topk[slot], self.topp[slot] = 0.0, 0, 1.0
            self.minp[slot] = 0.0
            self.key_valid = self.key_valid.at[slot].set(False)
            return True
        self.slots[slot] = req
        self.history[slot] = [int(x) for x in req.prompt_ids] + [tok]
        self.pos[slot] = T_true
        self.last_token[slot] = tok
        return True

    def _decode_step(self) -> list[Request]:
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return []
        if (self.spec_k > 0
                and all(self.slots[i].temperature <= 0.0 for i in active)):
            return self._verify_step(active)
        if self.decode_block > 1:
            return self._decode_multi_step(active)
        return self._decode_single_step(active)

    def _decode_single_step(self, active: list[int]) -> list[Request]:
        toks, lps, self.caches, self.key_valid = self._decode_fn(
            self.params, self.caches, self.key_valid,
            jnp.asarray(self.last_token), jnp.asarray(self.pos),
            self._base_key, jnp.uint32(self._draws),
            jnp.asarray(self.temp), jnp.asarray(self.topk),
            jnp.asarray(self.topp), jnp.asarray(self.minp),
        )
        self._draws += 1
        toks = np.asarray(toks)  # [B] int32 + [B] f32 logprobs to host
        lps = np.asarray(lps)
        finished = []
        for i in active:
            req = self.slots[i]
            tok = int(toks[i])
            req.logprobs.append(float(lps[i]))
            self._emit(req, tok)
            if self.history[i] is not None:
                self.history[i].append(tok)
            self.pos[i] += 1
            self.last_token[i] = tok
            eos = req.eos_token_id is not None and tok == req.eos_token_id
            if eos or len(req.output_ids) >= req.max_new_tokens:
                req.done = True
                req.finish_reason = "stop" if eos else "length"
                req._event.set()
                finished.append(req)
                self.slots[i] = None
                self.history[i] = None
                self.key_valid = self.key_valid.at[i].set(False)
                self.temp[i], self.topk[i], self.topp[i] = 0.0, 0, 1.0
                self.minp[i] = 0.0
        return finished

    def _emit(self, req: Request, tok: int):
        req.output_ids.append(int(tok))
        if req.stream_cb:
            req.stream_cb(int(tok))
