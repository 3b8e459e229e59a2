"""OpenAI-compatible HTTP server over the continuous-batching engine.

Analog of the reference's OpenAiServer (gptqmodel/utils/openai_server.py:23,
FastAPI + model.generate), built on the stdlib ThreadingHTTPServer (this
image ships no fastapi/uvicorn) and the slot scheduler instead of HF
generate. Endpoints:

- POST /v1/chat/completions   (messages -> chat template -> generate)
- POST /v1/completions        (raw prompt)
- GET  /v1/models

Both POST endpoints honor OpenAI ``stop`` sequences (str or list; matched
host-side on the decoded tail so sequences spanning token boundaries work —
the reference forwards them as HF ``stop_strings``, openai_server.py:80)
and ``n`` > 1 choices (n slots decoding concurrently in the shared batch).
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
    @staticmethod
    def _stops(req: dict) -> list:
        """Normalize OpenAI ``stop`` (str | list[str] | None) — the
        reference forwards it as HF ``stop_strings``
        (gptqmodel/utils/openai_server.py:80); here stop matching runs
        host-side on the decoded tail, so sequences spanning token
        boundaries match naturally."""
        s = req.get("stop")
        if s is None:
            return []
        return [s] if isinstance(s, str) else [str(x) for x in s]

    def _sampler_kw(self, req: dict) -> dict:
        return dict(
            max_new_tokens=int(req.get("max_tokens", 128)),
            temperature=float(req.get("temperature", 0.0)),
            top_k=int(req.get("top_k", 0)),
            top_p=float(req.get("top_p", 1.0)),
            min_p=float(req.get("min_p", 0.0)),
        )

    def _gen(self, prompt_ids, req: dict):
        stops = self._stops(req)
        cb = None
        if stops:
            # cancel the slot as soon as a stop string appears in the
            # decoded text (tokens already past it are truncated below)
            holder: list = []
            watch_ids: list[int] = []

            def cb(tok: int):
                watch_ids.append(tok)
                text = self.tokenizer.decode(
                    watch_ids, skip_special_tokens=True)
                if holder and any(s in text for s in stops):
                    holder[0].cancel()

        r = self.engine.submit(prompt_ids, stream_cb=cb,
                               **self._sampler_kw(req))
        if stops:
            holder.append(r)
        r.wait()
        ids = r.output_ids
        if self.engine.eos_token_id is not None and ids and ids[-1] == self.engine.eos_token_id:
            ids = ids[:-1]
        text = self.tokenizer.decode(ids, skip_special_tokens=True)
        reason = r.finish_reason
        if stops:
            cut = min((text.find(s) for s in stops if s in text),
                      default=-1)
            if cut >= 0:
                text, reason = text[:cut], "stop"
        return text, reason, len(r.output_ids), r

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
        stops = self._stops(req)
        r = self.engine.submit(
            ids, stream_cb=q.put, **self._sampler_kw(req))
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
        stop_reason = None
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
            if stops:
                cut = min((text.find(s) for s in stops if s in text),
                          default=-1)
                if cut >= 0:  # stop sequence complete (may span tokens)
                    r.cancel()
                    stop_reason = "stop"
                    text = text[:cut]
                    if text[len(sent):]:
                        body = ({"delta": {"content": text[len(sent):]}}
                                if chat else {"text": text[len(sent):]})
                        yield {
                            "id": rid, "object": obj, "created": created,
                            "model": self.model_name,
                            "choices": [dict(body, index=0,
                                             finish_reason=None)],
                        }
                    sent = text
                    break
                # hold back any tail that could still grow into a stop
                # sequence (emit only the prefix no stop can start in)
                safe = len(text)
                for s in stops:
                    for o in range(1, min(len(s), len(text)) + 1):
                        if text.endswith(s[:o]):
                            safe = min(safe, len(text) - o)
                text = text[:safe]
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
        if stops:  # always truncate the flush too (cancel lags a block)
            cut = min((text.find(s) for s in stops if s in text),
                      default=-1)
            if cut >= 0:
                stop_reason = "stop"
                text = text[:cut]
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
                         "finish_reason": stop_reason or r.finish_reason
                         or "stop"}],
        }

    def _gen_n(self, ids, req: dict):
        """``n`` choices (OpenAI ``n``): n slots decode CONCURRENTLY in the
        shared batch (submitted together, so the engine admits them into
        sibling slots in the same step). Greedy requests yield identical
        choices, as OpenAI's do at temperature 0."""
        n = max(1, int(req.get("n", 1)))
        if n == 1:
            return [self._gen(ids, req)]
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=n) as ex:
            return list(ex.map(lambda _: self._gen(ids, req), range(n)))

    def _chat(self, req: dict) -> dict:
        msgs = req.get("messages", [])
        ids = self.tokenizer.apply_chat_template(
            msgs, add_generation_prompt=True, tokenize=True
        )
        results = self._gen_n(ids, req)
        total_out = sum(n_out for _, _, n_out, _ in results)
        return {
            "id": "chatcmpl-0",
            "object": "chat.completion",
            "created": int(time.time()),
            "model": self.model_name,
            "choices": [{
                "index": i,
                "message": {"role": "assistant", "content": text},
                "finish_reason": reason or "stop",
            } for i, (text, reason, _, _) in enumerate(results)],
            "usage": {
                "prompt_tokens": len(ids),
                "completion_tokens": total_out,
                "total_tokens": len(ids) + total_out,
            },
        }

    def _completion(self, req: dict) -> dict:
        prompt = req.get("prompt", "")
        ids = self.tokenizer(prompt)["input_ids"]
        results = self._gen_n(ids, req)
        choices = []
        for i, (text, reason, n_out, r) in enumerate(results):
            choice = {"index": i, "text": text,
                      "finish_reason": reason or "stop"}
            if req.get("logprobs"):
                choice["logprobs"] = {
                    "tokens": [self.tokenizer.decode([t])
                               for t in r.output_ids],
                    "token_logprobs": [round(v, 6) for v in r.logprobs],
                }
            choices.append(choice)
        total_out = sum(n_out for _, _, n_out, _ in results)
        return {
            "id": "cmpl-0",
            "object": "text_completion",
            "created": int(time.time()),
            "model": self.model_name,
            "choices": choices,
            "usage": {
                "prompt_tokens": len(ids),
                "completion_tokens": total_out,
                "total_tokens": len(ids) + total_out,
            },
        }
