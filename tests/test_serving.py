"""Continuous batching + OpenAI server tests.

Models reference test_openai_server.py and the inference-correctness anchors:
the slot scheduler must produce exactly the same greedy tokens as the
full-forward oracle, under staggered admission (sequences joining mid-decode).
"""

import json
import socket
import tempfile
import threading
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from gptqmodel_tpu.utils.testing import random_dense_params, tiny_spec


def _oracle_greedy(spec, params, prompt, steps):
    from gptqmodel_tpu.models.transformer import forward_logits

    seq = list(prompt)
    out = []
    for _ in range(steps):
        logits = np.asarray(
            forward_logits(spec, params, jnp.asarray([seq], dtype=jnp.int32))
        )
        nxt = int(np.argmax(logits[0, -1]))
        out.append(nxt)
        seq.append(nxt)
    return out


def test_scheduler_matches_oracle_staggered():
    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine

    spec = tiny_spec(hidden=64, layers=2, heads=4, kv_heads=2, inter=128, vocab=128)
    params = random_dense_params(spec, seed=3)
    eng = ContinuousBatchingEngine(
        spec, params, max_slots=2, max_len=96, dtype=jnp.float32
    )

    rng = np.random.default_rng(0)
    p1 = rng.integers(1, 120, size=9).tolist()
    p2 = rng.integers(1, 120, size=17).tolist()
    p3 = rng.integers(1, 120, size=5).tolist()

    # staggered: submit p1, run 2 steps, submit p2+p3 (p3 queues: 2 slots)
    r1 = eng.submit(p1, max_new_tokens=6)
    eng.step()
    eng.step()
    r2 = eng.submit(p2, max_new_tokens=5)
    r3 = eng.submit(p3, max_new_tokens=4)
    eng.run_until_idle()

    assert r1.output_ids == _oracle_greedy(spec, params, p1, 6)
    assert r2.output_ids == _oracle_greedy(spec, params, p2, 5)
    assert r3.output_ids == _oracle_greedy(spec, params, p3, 4)
    assert r1.done and r2.done and r3.done


def test_scheduler_sampling_reproducible():
    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine

    spec = tiny_spec(hidden=64, layers=1, heads=4, kv_heads=2, inter=128, vocab=64)
    params = random_dense_params(spec, seed=1)
    outs = []
    for _ in range(2):
        eng = ContinuousBatchingEngine(
            spec, params, max_slots=1, max_len=64, dtype=jnp.float32, seed=42
        )
        outs.append(eng.generate([5, 6, 7], max_new_tokens=8, temperature=0.8, top_k=10))
    assert outs[0] == outs[1]
    assert len(outs[0]) == 8


class _FakeTokenizer:
    def __call__(self, text):
        return {"input_ids": [ord(c) % 120 + 1 for c in text][:32]}

    def decode(self, ids, **kw):
        return " ".join(map(str, ids))

    def apply_chat_template(self, msgs, **kw):
        joined = " ".join(m.get("content", "") for m in msgs)
        return self(joined)["input_ids"]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_openai_server_endpoints():
    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine
    from gptqmodel_tpu.inference.server import OpenAiServer

    spec = tiny_spec(hidden=64, layers=1, heads=4, kv_heads=2, inter=128, vocab=128)
    params = random_dense_params(spec, seed=2)
    eng = ContinuousBatchingEngine(
        spec, params, max_slots=2, max_len=128, dtype=jnp.float32
    )
    srv = OpenAiServer(eng, _FakeTokenizer())
    port = _free_port()
    srv.start(port=port, block=False)
    try:
        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        out = post("/v1/completions", {"prompt": "hello world", "max_tokens": 4})
        assert out["object"] == "text_completion"
        assert out["usage"]["completion_tokens"] == 4
        assert out["choices"][0]["text"]

        out = post(
            "/v1/chat/completions",
            {"messages": [{"role": "user", "content": "hi"}], "max_tokens": 3},
        )
        assert out["object"] == "chat.completion"
        assert out["choices"][0]["message"]["role"] == "assistant"

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/models", timeout=30
        ) as r:
            models = json.loads(r.read())
        assert models["data"][0]["id"]

        # concurrent clients share the decode batch
        results = {}
        def worker(i):
            results[i] = post(
                "/v1/completions", {"prompt": f"req {i}", "max_tokens": 3}
            )
        ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        [t.start() for t in ts]
        [t.join(timeout=120) for t in ts]
        assert len(results) == 4
    finally:
        srv.shutdown()


def test_openai_server_streaming():
    """SSE streaming (stream: true): chunked deltas concatenate to the
    non-streamed completion, protocol framing intact (data:/[DONE])."""
    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine
    from gptqmodel_tpu.inference.server import OpenAiServer

    spec = tiny_spec(hidden=64, layers=1, heads=4, kv_heads=2, inter=128,
                     vocab=128)
    params = random_dense_params(spec, seed=4)
    eng = ContinuousBatchingEngine(
        spec, params, max_slots=2, max_len=128, dtype=jnp.float32)
    srv = OpenAiServer(eng, _FakeTokenizer())
    port = _free_port()
    srv.start(port=port, block=False)
    try:
        def post_raw(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.read().decode(), r.headers.get("Content-Type")

        plain = json.loads(post_raw(
            "/v1/completions", {"prompt": "hello", "max_tokens": 6})[0])
        body, ctype = post_raw(
            "/v1/completions",
            {"prompt": "hello", "max_tokens": 6, "stream": True})
        assert ctype.startswith("text/event-stream")
        lines = [ln for ln in body.split("\n\n") if ln.startswith("data: ")]
        assert lines[-1] == "data: [DONE]"
        chunks = [json.loads(ln[len("data: "):]) for ln in lines[:-1]]
        text = "".join(c["choices"][0].get("text", "") for c in chunks)
        assert text == plain["choices"][0]["text"]
        assert chunks[-1]["choices"][0]["finish_reason"] == "length"

        body, _ = post_raw(
            "/v1/chat/completions",
            {"messages": [{"role": "user", "content": "hi"}],
             "max_tokens": 4, "stream": True})
        lines = [ln for ln in body.split("\n\n") if ln.startswith("data: ")]
        chunks = [json.loads(ln[len("data: "):]) for ln in lines[:-1]]
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        assert chunks[0]["object"] == "chat.completion.chunk"
        assert any(c["choices"][0].get("delta", {}).get("content")
                   for c in chunks[1:])
    finally:
        srv.shutdown()


def test_completions_logprobs():
    """OpenAI completions `logprobs`: chosen-token log P of the RAW model
    distribution (greedy => each logprob is the max log-softmax entry)."""
    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine
    from gptqmodel_tpu.inference.server import OpenAiServer
    from gptqmodel_tpu.models.transformer import forward_logits

    spec = tiny_spec(hidden=64, layers=1, heads=4, kv_heads=2, inter=128,
                     vocab=128)
    params = random_dense_params(spec, seed=6)
    eng = ContinuousBatchingEngine(
        spec, params, max_slots=1, max_len=64, dtype=jnp.float32)
    r = eng.submit([5, 6, 7], max_new_tokens=4)
    while not r.done:
        eng.step()
    assert len(r.logprobs) == 4
    # oracle: greedy token's logprob from a full forward
    seq = [5, 6, 7]
    for t, lp in zip(r.output_ids, r.logprobs):
        logits = np.asarray(forward_logits(
            spec, params, jnp.asarray([seq], dtype=jnp.int32)))[0, -1]
        ref = logits - (np.log(np.exp(logits - logits.max()).sum())
                        + logits.max())
        assert t == int(np.argmax(logits))
        assert abs(lp - ref[t]) < 5e-4, (lp, ref[t])
        seq.append(t)

    srv = OpenAiServer(eng, _FakeTokenizer())
    port = _free_port()
    srv.start(port=port, block=False)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": "abc", "max_tokens": 3,
                             "logprobs": 1}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = json.loads(resp.read())
        lp = out["choices"][0]["logprobs"]
        assert len(lp["token_logprobs"]) == 3
        assert all(isinstance(v, float) and v <= 0.0
                   for v in lp["token_logprobs"])
        assert len(lp["tokens"]) == 3
    finally:
        srv.shutdown()


def test_decode_block_matches_single_step():
    """decode_block>1 fuses n steps per dispatch but must emit exactly the
    tokens n single steps would: greedy vs the full-forward oracle
    (mid-block EOS-free), sampled vs the block=1 engine under the SAME
    seed/draw sequence (one request => identical fold_in order)."""
    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine

    spec = tiny_spec(hidden=64, layers=2, heads=4, kv_heads=2, inter=128,
                     vocab=128)
    params = random_dense_params(spec, seed=3)
    rng = np.random.default_rng(1)
    p1 = rng.integers(1, 120, size=9).tolist()
    p2 = rng.integers(1, 120, size=17).tolist()

    # greedy, staggered admission, outputs not multiples of the block
    eng = ContinuousBatchingEngine(
        spec, params, max_slots=2, max_len=96, dtype=jnp.float32,
        decode_block=4)
    r1 = eng.submit(p1, max_new_tokens=7)
    eng.step()
    r2 = eng.submit(p2, max_new_tokens=5)
    eng.run_until_idle()
    assert r1.output_ids == _oracle_greedy(spec, params, p1, 7)
    assert r2.output_ids == _oracle_greedy(spec, params, p2, 5)
    assert len(r1.logprobs) == 7 and len(r2.logprobs) == 5

    # sampled: same seed, single request -> identical draw sequence
    outs = {}
    for blk in (1, 4):
        eng = ContinuousBatchingEngine(
            spec, params, max_slots=2, max_len=96, dtype=jnp.float32,
            decode_block=blk, seed=11)
        r = eng.submit(p1, max_new_tokens=9, temperature=0.9, top_k=20,
                       top_p=0.9)
        while not r.done:
            eng.step()
        outs[blk] = (list(r.output_ids), list(r.logprobs))
    assert outs[1][0] == outs[4][0]
    np.testing.assert_allclose(outs[1][1], outs[4][1], rtol=1e-5)


def test_decode_block_eos_mid_block():
    """A request hitting EOS mid-block stops there; post-stop tokens are
    discarded and the freed slot serves the next request correctly."""
    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine

    spec = tiny_spec(hidden=64, layers=2, heads=4, kv_heads=2, inter=128,
                     vocab=128)
    params = random_dense_params(spec, seed=3)
    rng = np.random.default_rng(2)
    p1 = rng.integers(1, 120, size=9).tolist()
    p2 = rng.integers(1, 120, size=5).tolist()
    ref = _oracle_greedy(spec, params, p1, 12)
    eos = ref[3]  # force a stop at the 4th token (mid-block for block=8)

    eng = ContinuousBatchingEngine(
        spec, params, max_slots=1, max_len=96, dtype=jnp.float32,
        decode_block=8, eos_token_id=eos)
    r1 = eng.submit(p1, max_new_tokens=12)
    r2 = eng.submit(p2, max_new_tokens=4)  # queued behind the single slot
    eng.run_until_idle()
    assert r1.output_ids == ref[:4]
    assert r1.finish_reason == "stop"
    ref2 = _oracle_greedy(spec, params, p2, 12)
    stop2 = (ref2.index(eos) + 1) if eos in ref2 else 4
    assert r2.output_ids == ref2[:min(stop2, 4)]


def test_scheduler_recurrent_mamba_matches_oracle():
    """Pipelined scheduling over RECURRENT caches (conv+ssm, no KV):
    decode_block/spec are force-disabled, but the r5 dispatch-ahead lag
    still applies — a released slot's state runs one garbage block before
    re-admission overwrites it wholesale. Staggered admission + slot
    REUSE must stay oracle-exact."""
    import tempfile
    from pathlib import Path

    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine
    from gptqmodel_tpu.models.transformer import forward_logits
    from tests.test_model_breadth import _jax_logits

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="falcon_mamba", vocab_size=128, hidden_size=64,
            state_size=8, num_hidden_layers=2, conv_kernel=4, expand=2,
            time_step_rank=8, use_bias=False, use_conv_bias=True,
            tie_word_embeddings=False)
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(
            torch.float32).eval().save_pretrained(
            Path(tmp) / "m", safe_serialization=True)
        spec, params, _, _ = _jax_logits(Path(tmp) / "m")

    def oracle(prompt, steps):
        seq = list(prompt)
        out = []
        for _ in range(steps):
            lg = np.asarray(forward_logits(
                spec, params, jnp.asarray([seq], dtype=jnp.int32)))
            nxt = int(np.argmax(lg[0, -1]))
            out.append(nxt)
            seq.append(nxt)
        return out

    rng = np.random.default_rng(5)
    p1 = rng.integers(1, 120, size=9).tolist()
    p2 = rng.integers(1, 120, size=17).tolist()
    p3 = rng.integers(1, 120, size=5).tolist()

    eng = ContinuousBatchingEngine(
        spec, params, max_slots=2, max_len=96, dtype=jnp.float32,
        decode_block=8, spec_k=4)  # both must self-disable on recurrents
    assert eng.decode_block == 1 and eng.spec_k == 0
    r1 = eng.submit(p1, max_new_tokens=6)
    eng.step()
    eng.step()
    r2 = eng.submit(p2, max_new_tokens=5)
    r3 = eng.submit(p3, max_new_tokens=4)  # queued: reuses a freed slot
    eng.run_until_idle()
    assert r1.output_ids == oracle(p1, 6)
    assert r2.output_ids == oracle(p2, 5)
    assert r3.output_ids == oracle(p3, 4)


def test_scheduler_hybrid_lfm2_matches_oracle():
    """Hybrid conv+attention (lfm2) through the scheduler: mixed cache
    types per layer, exact-length recurrent prefill, per-slot attention
    writes — staggered admission + slot reuse vs the oracle."""
    import tempfile
    from pathlib import Path

    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine
    from gptqmodel_tpu.models.transformer import forward_logits
    from tests.test_model_breadth import _jax_logits

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="lfm2", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=2, conv_L_cache=3,
            layer_types=["conv", "full_attention", "conv"],
            block_auto_adjust_ff_dim=False,
            max_position_embeddings=256, tie_word_embeddings=False)
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(
            torch.float32).eval().save_pretrained(
            Path(tmp) / "m", safe_serialization=True)
        spec, params, _, _ = _jax_logits(Path(tmp) / "m")

    def oracle(prompt, steps):
        seq = list(prompt)
        out = []
        for _ in range(steps):
            lg = np.asarray(forward_logits(
                spec, params, jnp.asarray([seq], dtype=jnp.int32)))
            nxt = int(np.argmax(lg[0, -1]))
            out.append(nxt)
            seq.append(nxt)
        return out

    rng = np.random.default_rng(7)
    p1 = rng.integers(1, 120, size=9).tolist()
    p2 = rng.integers(1, 120, size=13).tolist()
    p3 = rng.integers(1, 120, size=6).tolist()

    eng = ContinuousBatchingEngine(
        spec, params, max_slots=2, max_len=96, dtype=jnp.float32)
    assert eng._recurrent  # conv layers force exact-length prefill
    r1 = eng.submit(p1, max_new_tokens=6)
    eng.step()
    eng.step()
    r2 = eng.submit(p2, max_new_tokens=5)
    r3 = eng.submit(p3, max_new_tokens=4)
    eng.run_until_idle()
    assert r1.output_ids == oracle(p1, 6)
    assert r2.output_ids == oracle(p2, 5)
    assert r3.output_ids == oracle(p3, 4)


def test_greedy_generate_rejects_ragged_recurrent():
    """Batch greedy_generate must refuse ragged prompt lengths on
    recurrent-cache models (pad tokens would flow through conv/ssm
    state) — equal-length batches still work."""
    import tempfile
    from pathlib import Path

    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from gptqmodel_tpu.inference.engine import greedy_generate
    from tests.test_model_breadth import _jax_logits

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="falcon_mamba", vocab_size=128, hidden_size=64,
            state_size=8, num_hidden_layers=1, conv_kernel=4, expand=2,
            time_step_rank=8, use_bias=False, use_conv_bias=True,
            tie_word_embeddings=False)
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(
            torch.float32).eval().save_pretrained(
            Path(tmp) / "m", safe_serialization=True)
        spec, params, _, _ = _jax_logits(Path(tmp) / "m")

    ids = np.ones((2, 8), np.int32)
    with pytest.raises(ValueError, match="ragged"):
        greedy_generate(spec, params, ids,
                        prompt_lens=np.array([8, 5]), max_new_tokens=2,
                        dtype=jnp.float32)
    out = greedy_generate(spec, params, ids, max_new_tokens=2,
                          dtype=jnp.float32)
    assert out.shape == (2, 2)
