"""OpenAI server parity (VERDICT r4 #6): ``stop`` sequences (including one
that spans a token boundary) and ``n`` > 1 choices.

Reference behavior being matched: gptqmodel/utils/openai_server.py:37-43,80
passes ``stop_strings=request.stop`` into HF generate; OpenAI semantics cut
the text BEFORE the stop sequence and report finish_reason "stop"."""

import json
import socket
import urllib.request

import numpy as np

import jax.numpy as jnp

from gptqmodel_tpu.utils.testing import random_dense_params, tiny_spec


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


def _serve(seed=2, max_slots=4):
    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine
    from gptqmodel_tpu.inference.server import OpenAiServer

    spec = tiny_spec(hidden=64, layers=1, heads=4, kv_heads=2, inter=128,
                     vocab=128)
    params = random_dense_params(spec, seed=seed)
    eng = ContinuousBatchingEngine(
        spec, params, max_slots=max_slots, max_len=128, dtype=jnp.float32)
    srv = OpenAiServer(eng, _FakeTokenizer())
    port = _free_port()
    srv.start(port=port, block=False)
    return srv, port


def _post(port, path, payload, raw=False):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        body = r.read().decode()
    return body if raw else json.loads(body)


def test_stop_sequence_spanning_token_boundary():
    srv, port = _serve()
    try:
        base = _post(port, "/v1/completions",
                     {"prompt": "hello world", "max_tokens": 8})
        full = base["choices"][0]["text"]  # "t1 t2 t3 ..." joined ids
        toks = full.split(" ")
        assert len(toks) == 8
        # a stop string that SPANS the boundary between tokens 3 and 4:
        # last char of tok3 + separator + first char of tok4
        stop = toks[2][-1] + " " + toks[3][0]
        assert stop in full
        out = _post(port, "/v1/completions",
                    {"prompt": "hello world", "max_tokens": 8,
                     "stop": stop})
        cut = full.find(stop)
        assert out["choices"][0]["text"] == full[:cut]
        assert out["choices"][0]["finish_reason"] == "stop"

        # list form + no-match passthrough
        out2 = _post(port, "/v1/completions",
                     {"prompt": "hello world", "max_tokens": 8,
                      "stop": ["@@nope@@", stop]})
        assert out2["choices"][0]["text"] == full[:cut]
        out3 = _post(port, "/v1/completions",
                     {"prompt": "hello world", "max_tokens": 8,
                      "stop": "@@nope@@"})
        assert out3["choices"][0]["text"] == full
        assert out3["choices"][0]["finish_reason"] == "length"
    finally:
        srv.shutdown()


def test_stop_sequence_streaming():
    srv, port = _serve(seed=3)
    try:
        base = _post(port, "/v1/completions",
                     {"prompt": "stream me", "max_tokens": 8})
        full = base["choices"][0]["text"]
        toks = full.split(" ")
        stop = toks[3][-1] + " " + toks[4][0]  # spans tokens 4/5
        cut = full.find(stop)
        body = _post(port, "/v1/completions",
                     {"prompt": "stream me", "max_tokens": 8,
                      "stop": stop, "stream": True}, raw=True)
        lines = [ln for ln in body.split("\n\n") if ln.startswith("data: ")]
        assert lines[-1] == "data: [DONE]"
        chunks = [json.loads(ln[len("data: "):]) for ln in lines[:-1]]
        text = "".join(c["choices"][0].get("text", "") for c in chunks)
        assert text == full[:cut]
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
    finally:
        srv.shutdown()


def test_n_choices():
    srv, port = _serve(seed=4)
    try:
        out = _post(port, "/v1/completions",
                    {"prompt": "abc", "max_tokens": 5, "n": 3})
        ch = out["choices"]
        assert [c["index"] for c in ch] == [0, 1, 2]
        # greedy: all n choices identical (OpenAI behavior at temp 0)
        assert ch[0]["text"] == ch[1]["text"] == ch[2]["text"]
        assert out["usage"]["completion_tokens"] == 15

        out = _post(port, "/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "hi"}],
                     "max_tokens": 4, "n": 2})
        assert len(out["choices"]) == 2
        assert out["choices"][1]["message"]["role"] == "assistant"
    finally:
        srv.shutdown()
