"""OpenAI-compatible HTTP server over the continuous-batching engine.

Analog of the reference's OpenAiServer (gptqmodel/utils/openai_server.py:23,
FastAPI + model.generate), built on the stdlib ThreadingHTTPServer (this
image ships no fastapi/uvicorn) and the slot scheduler instead of HF
generate. Endpoints:

- POST /v1/chat/completions   (messages -> chat template -> generate)
- POST /v1/completions        (raw prompt)
- GET  /v1/models

Both POST endpoints honor ``"stream": true`` with OpenAI-protocol SSE
(``data: {chunk}\n\n`` ... ``data: [DONE]``): the engine's per-token
``stream_cb`` feeds a queue the handler drains, emitting incremental text
deltas (full-prefix re-decode per token so multi-byte tokenizer merges
stay correct).

A single background thread drives ``engine.step()``; HTTP handler threads
submit requests and block on their completion events, so many concurrent
clients share the decode batch.
"""

from __future__ import annotations

import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

log = logging.getLogger("gptqmodel_tpu")


class OpenAiServer:
    def __init__(self, engine, tokenizer, model_name: str = "gptqmodel-tpu"):
        self.engine = engine
        self.tokenizer = tokenizer
        self.model_name = model_name
        self._stop = threading.Event()
        self._httpd = None
        self._threads: list[threading.Thread] = []

    # --------------------------------------------------------------- loop
    def _engine_loop(self):
        while not self._stop.is_set():
            if self.engine.has_work():
                self.engine.step()
            else:
                time.sleep(0.005)

    # ---------------------------------------------------------- lifecycle
    def start(self, host: str = "127.0.0.1", port: int = 8000, block: bool = True):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                log.debug("http: " + fmt, *args)

            def _json(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/v1/models":
                    self._json(200, {
                        "object": "list",
                        "data": [{
                            "id": server.model_name,
                            "object": "model",
                            "owned_by": "gptqmodel_tpu",
                        }],
                    })
                else:
                    self._json(404, {"error": "not found"})

            def _sse(self, chunks):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                # after this point the response is COMMITTED: errors must
                # not fall through to a second status line (review finding
                # r4) — at most emit a best-effort SSE error event
                try:
                    for payload in chunks:
                        self.wfile.write(
                            b"data: " + json.dumps(payload).encode()
                            + b"\n\n")
                        self.wfile.flush()
                    self.wfile.write(b"data: [DONE]\n\n")
                    self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    log.debug("SSE client disconnected")
                except Exception as e:
                    log.warning("SSE stream error: %s", e)
                    try:
                        self.wfile.write(
                            b"data: " + json.dumps(
                                {"error": {"message": str(e)}}).encode()
                            + b"\n\n")
                        self.wfile.flush()
                    except OSError:
                        pass

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    chat = self.path == "/v1/chat/completions"
                    if self.path not in ("/v1/chat/completions",
                                         "/v1/completions"):
                        self._json(404, {"error": "not found"})
                        return
                    if req.get("stream"):
                        self._sse(server._stream(req, chat=chat))
                        return
                    elif chat:
                        self._json(200, server._chat(req))
                    else:
                        self._json(200, server._completion(req))
                except Exception as e:  # surface errors as API errors
                    self._json(500, {"error": {"message": str(e)}})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        t = threading.Thread(target=self._engine_loop, daemon=True)
        t.start()
        self._threads.append(t)
        log.info("OpenAI server on http://%s:%d", host, port)
        if block:
            try:
                self._httpd.serve_forever()
            finally:
                self.shutdown()
        else:
            t2 = threading.Thread(target=self._httpd.serve_forever, daemon=True)
            t2.start()
            self._threads.append(t2)

    def shutdown(self):
        self._stop.set()
        if self._httpd:
            self._httpd.shutdown()

    # ----------------------------------------------------------- handlers
    def _gen(self, prompt_ids, req: dict):
        r = self.engine.submit(
            prompt_ids,
            max_new_tokens=int(req.get("max_tokens", 128)),
            temperature=float(req.get("temperature", 0.0)),
            top_k=int(req.get("top_k", 0)),
            top_p=float(req.get("top_p", 1.0)),
            min_p=float(req.get("min_p", 0.0)),
        )
        r.wait()
        ids = r.output_ids
        if self.engine.eos_token_id is not None and ids and ids[-1] == self.engine.eos_token_id:
            ids = ids[:-1]
        text = self.tokenizer.decode(ids, skip_special_tokens=True)
        return text, r.finish_reason, len(r.output_ids), r

    def _stream(self, req: dict, chat: bool):
        """Generator of OpenAI stream chunks (the SSE payloads)."""
        import queue

        if chat:
            ids = self.tokenizer.apply_chat_template(
                req.get("messages", []), add_generation_prompt=True,
                tokenize=True)
        else:
            ids = self.tokenizer(req.get("prompt", ""))["input_ids"]
        q: queue.Queue = queue.Queue()
        r = self.engine.submit(
            ids,
            max_new_tokens=int(req.get("max_tokens", 128)),
            temperature=float(req.get("temperature", 0.0)),
            top_k=int(req.get("top_k", 0)),
            top_p=float(req.get("top_p", 1.0)),
            min_p=float(req.get("min_p", 0.0)),
            stream_cb=q.put,
        )
        obj = "chat.completion.chunk" if chat else "text_completion"
        rid = "chatcmpl-0" if chat else "cmpl-0"
        created = int(time.time())
        if chat:  # role preamble chunk (OpenAI protocol)
            yield {
                "id": rid, "object": obj, "created": created,
                "model": self.model_name,
                "choices": [{"index": 0,
                             "delta": {"role": "assistant", "content": ""},
                             "finish_reason": None}],
            }
        out_ids: list[int] = []
        sent = ""
        while True:
            try:
                tok = q.get(timeout=0.1)
            except queue.Empty:
                if r.done and q.empty():
                    break
                continue
            if (self.engine.eos_token_id is not None
                    and tok == self.engine.eos_token_id):
                continue
            out_ids.append(int(tok))
            # full-prefix re-decode: the delta is whatever text appeared
            # (multi-byte/multi-token merges emit nothing until complete).
            # Hold back while the tail is an INCOMPLETE UTF-8 sequence
            # (U+FFFD): emitting it would stream a replacement char that a
            # later token retroactively changes (review finding r4)
            text = self.tokenizer.decode(out_ids, skip_special_tokens=True)
            if text.endswith("\ufffd"):
                continue
            delta, sent = text[len(sent):], text
            if not delta:
                continue
            body = ({"delta": {"content": delta}} if chat
                    else {"text": delta})
            yield {
                "id": rid, "object": obj, "created": created,
                "model": self.model_name,
                "choices": [dict(body, index=0, finish_reason=None)],
            }
        # flush any held-back tail (even a genuinely invalid sequence is
        # emitted once generation is over)
        text = self.tokenizer.decode(out_ids, skip_special_tokens=True)
        if text[len(sent):]:
            body = ({"delta": {"content": text[len(sent):]}} if chat
                    else {"text": text[len(sent):]})
            yield {
                "id": rid, "object": obj, "created": created,
                "model": self.model_name,
                "choices": [dict(body, index=0, finish_reason=None)],
            }
        yield {
            "id": rid, "object": obj, "created": created,
            "model": self.model_name,
            "choices": [{"index": 0,
                         **({"delta": {}} if chat else {"text": ""}),
                         "finish_reason": r.finish_reason or "stop"}],
        }

    def _chat(self, req: dict) -> dict:
        msgs = req.get("messages", [])
        ids = self.tokenizer.apply_chat_template(
            msgs, add_generation_prompt=True, tokenize=True
        )
        text, reason, n_out, _r = self._gen(ids, req)
        return {
            "id": "chatcmpl-0",
            "object": "chat.completion",
            "created": int(time.time()),
            "model": self.model_name,
            "choices": [{
                "index": 0,
                "message": {"role": "assistant", "content": text},
                "finish_reason": reason or "stop",
            }],
            "usage": {
                "prompt_tokens": len(ids),
                "completion_tokens": n_out,
                "total_tokens": len(ids) + n_out,
            },
        }

    def _completion(self, req: dict) -> dict:
        prompt = req.get("prompt", "")
        ids = self.tokenizer(prompt)["input_ids"]
        text, reason, n_out, r = self._gen(ids, req)
        choice = {"index": 0, "text": text, "finish_reason": reason or "stop"}
        if req.get("logprobs"):
            choice["logprobs"] = {
                "tokens": [self.tokenizer.decode([t]) for t in r.output_ids],
                "token_logprobs": [round(v, 6) for v in r.logprobs],
            }
        return {
            "id": "cmpl-0",
            "object": "text_completion",
            "created": int(time.time()),
            "model": self.model_name,
            "choices": [choice],
            "usage": {
                "prompt_tokens": len(ids),
                "completion_tokens": n_out,
                "total_tokens": len(ids) + n_out,
            },
        }
