"""HTTP serving front-end over InferenceServer — stdlib only.

Green-field capability (the reference `/root/reference` is a tensor
library with no serving stack).  Wraps the paged-KV continuous-batching
engine (models/serve.py) in an OpenAI-style HTTP API so the framework
serves traffic out of the box:

    POST /v1/completions   {"prompt": "text" | [tokens], "max_tokens": N,
                            "temperature", "top_p", "top_k", "min_p",
                            "stop": [[tok,...],...], "lora_id",
                            "repetition_penalty", "presence_penalty",
                            "frequency_penalty", "logit_bias",
                            "stream": false}
                           -> {"id", "choices": [{"text"?, "tokens",
                               "logprobs", "finish_reason"}], "usage"}
                           stream=true -> text/event-stream, one
                           `data: {"id", "token", "text"?, "logprob",
                           "finished"}` event per token, then `data: [DONE]`
    POST /v1/cancel        {"id": N} -> {"cancelled": bool}
    GET  /v1/stats         engine throughput_stats + queue depth
    GET  /v1/models        model config summary

Design: HTTP handler threads never touch the engine.  ONE engine thread
owns the InferenceServer (JAX dispatch stays single-threaded); handlers
enqueue (submit-spec, event-queue) pairs into an inbox and block on their
event queue.  The engine loop drains the inbox, then advances the
scheduler one iteration via `stream(max_steps=1)` — continuous batching
across requests that arrive mid-flight falls out of the engine's own
admission logic.  When fully idle it blocks on the inbox (zero busy-wait).

Text mode: pass a tokenizer (models/tokenizer.BPETokenizer or anything
with encode/decode_bytes) and string prompts encode server-side; streamed
tokens decode incrementally with UTF-8 carry (multi-byte sequences split
across tokens are held back until complete, never mojibake'd).
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Utf8Carry:
    """Incremental UTF-8 decode: emits only complete characters, carrying
    partial trailing sequences to the next chunk (stdlib incremental
    decoder; malformed bytes become replacement chars, never a stall)."""

    def __init__(self):
        import codecs

        self._dec = codecs.getincrementaldecoder("utf-8")(errors="replace")

    def feed(self, data: bytes) -> str:
        return self._dec.decode(data, False)

    @property
    def pending(self) -> bytes:
        return self._dec.getstate()[0]


CHAT_SPECIALS = ("<|im_start|>", "<|im_end|>")


def chatml_prompt(tokenizer, messages) -> "np.ndarray":
    """Render [{"role", "content"}] as ChatML and encode it:

        <|im_start|>role\ncontent<|im_end|>\n ... <|im_start|>assistant\n

    The tokenizer must register CHAT_SPECIALS (e.g.
    `tok.with_special_tokens(["<|im_start|>", "<|im_end|>"])`) so the
    markers are single hard-boundary tokens the model can learn/stop on."""
    for lit in CHAT_SPECIALS:
        tokenizer.special_id(lit)  # KeyError -> clear failure mode
    text = "".join(
        f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n"
        for m in messages)
    text += "<|im_start|>assistant\n"
    return tokenizer.encode(text)


class ApiServer:
    """HTTP API around an InferenceServer.  start() spins the engine
    thread + HTTP listener; shutdown() stops both.  `port=0` binds an
    ephemeral port (read it back from `.port`)."""

    def __init__(self, engine, tokenizer=None, host: str = "127.0.0.1",
                 port: int = 0):
        self.engine = engine
        self.tokenizer = tokenizer
        self._inbox: queue.Queue = queue.Queue()
        self._events: dict[int, queue.Queue] = {}
        self._lock = threading.Lock()  # guards _events and cancel calls
        self._stop = threading.Event()
        self._engine_thread = threading.Thread(
            target=self._engine_loop, name="kfunca-engine", daemon=True)
        handler = _make_handler(self)
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._http_thread = threading.Thread(
            target=self._httpd.serve_forever, name="kfunca-http", daemon=True)

    # -- lifecycle -----------------------------------------------------
    def start(self):
        self._engine_thread.start()
        self._http_thread.start()
        return self

    def shutdown(self):
        self._stop.set()
        self._inbox.put(None)  # wake the engine thread
        self._httpd.shutdown()
        self._httpd.server_close()
        self._engine_thread.join(timeout=10)

    # -- engine thread ---------------------------------------------------
    def _engine_loop(self):
        try:
            self._engine_loop_inner()
        except Exception as e:  # engine died: fail every waiter, not hang
            self._stop.set()
            with self._lock:
                for evq in self._events.values():
                    evq.put(("done", None))
                self._events.clear()
            while True:
                try:
                    item = self._inbox.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    item[2].put(("error", f"engine thread died: {e!r}"))

    def _engine_loop_inner(self):
        while not self._stop.is_set():
            # drain the inbox; block when the engine is idle
            idle = not self._engine_busy()
            try:
                item = self._inbox.get(block=idle, timeout=None if not idle
                                       else 0.5)
            except queue.Empty:
                item = False  # timed out while idle: loop and re-check
            while item is not False:
                if item is None:
                    if self._stop.is_set():
                        return
                    item = False
                    break
                op, payload, evq = item
                if op == "submit":
                    try:
                        rid = self.engine.submit(**payload)
                        with self._lock:
                            self._events[rid] = evq
                        evq.put(("rid", rid))
                    except Exception as e:  # bad request params
                        evq.put(("error", str(e)))
                else:  # "cancel" — engine state mutates on this thread only
                    evq.put(("cancelled", self.engine.cancel(payload)))
                try:
                    item = self._inbox.get_nowait()
                except queue.Empty:
                    item = False
            # one scheduler iteration (admission + decode + events)
            for rid, token, logprob, finished in self.engine.stream(
                    max_steps=1):
                with self._lock:
                    evq = self._events.get(rid)
                if evq is None:
                    continue
                evq.put(("token", (int(token), float(logprob), finished)))
                if finished:
                    evq.put(("done", None))
                    with self._lock:
                        self._events.pop(rid, None)
            # cancelled requests finish without a stream event: flush them
            with self._lock:
                ended = [rid for rid in self._events
                         if self.engine.requests[rid].done]
                for rid in ended:
                    self._events.pop(rid).put(("done", None))

    def _engine_busy(self) -> bool:
        e = self.engine
        return (len(e.queue) > 0 or bool(e._prefill_state)
                or any(r is not None for r in e.slot_req))

    # -- handler-side helpers ---------------------------------------------
    def submit_async(self, spec: dict) -> tuple[int, queue.Queue]:
        """Called from HTTP handler threads: enqueue and wait for the
        engine thread to ack with the request id."""
        evq: queue.Queue = queue.Queue()
        self._inbox.put(("submit", spec, evq))
        kind, val = evq.get(timeout=120)
        if kind == "error":
            raise ValueError(val)
        return val, evq

    def cancel(self, rid: int) -> bool:
        """Thread-safe cancel: executed by the engine thread."""
        evq: queue.Queue = queue.Queue()
        self._inbox.put(("cancel", rid, evq))
        return bool(evq.get(timeout=120)[1])


def _make_handler(api: ApiServer):
    class Handler(BaseHTTPRequestHandler):
        # quiet: BaseHTTPRequestHandler logs to stderr per request
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        # -- GET ----------------------------------------------------------
        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/v1/stats":
                stats = dict(api.engine.throughput_stats())
                stats["queued"] = len(api.engine.queue)
                self._json(200, stats)
            elif self.path == "/v1/models":
                cfg = api.engine.cfg
                self._json(200, {
                    "d_model": cfg.d_model, "n_layers": cfg.n_layers,
                    "n_heads": cfg.n_heads, "vocab_size": cfg.vocab_size,
                    "n_experts": cfg.n_experts,
                    "text": api.tokenizer is not None,
                })
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        # -- POST ---------------------------------------------------------
        def do_POST(self):  # noqa: N802
            try:
                body = self._read_body()
            except (ValueError, json.JSONDecodeError) as e:
                return self._json(400, {"error": f"bad json: {e}"})
            if self.path == "/v1/cancel":
                return self._json(
                    200, {"cancelled": api.cancel(int(body.get("id", -1)))})
            if self.path == "/v1/chat/completions":
                if api.tokenizer is None:
                    return self._json(400, {
                        "error": "chat needs a server tokenizer"})
                msgs = body.get("messages")
                if not isinstance(msgs, list) or not all(
                        isinstance(m, dict) and "role" in m and "content" in m
                        for m in msgs):
                    return self._json(400, {
                        "error": "messages: [{role, content}, ...]"})
                try:
                    body["prompt"] = chatml_prompt(api.tokenizer,
                                                   msgs).tolist()
                except KeyError as e:
                    return self._json(400, {
                        "error": f"tokenizer lacks chat special token {e}"})
                # default stop: the end-of-turn marker
                body.setdefault("stop", [[int(api.tokenizer.special_id(
                    "<|im_end|>"))]])
            elif self.path != "/v1/completions":
                return self._json(404, {"error": f"unknown path {self.path}"})

            prompt = body.get("prompt")
            if isinstance(prompt, str):
                if api.tokenizer is None:
                    return self._json(400, {
                        "error": "string prompt needs a server tokenizer; "
                                 "send token ids"})
                prompt_ids = np.asarray(api.tokenizer.encode(prompt),
                                        np.int32)
            elif isinstance(prompt, list):
                prompt_ids = np.asarray(prompt, np.int32)
            else:
                return self._json(400, {"error": "prompt: string or [ids]"})

            spec = {"prompt": prompt_ids,
                    "max_new": int(body.get("max_tokens", 16))}
            for k_http, k_engine in (
                    ("temperature", "temperature"), ("top_p", "top_p"),
                    ("top_k", "top_k"), ("min_p", "min_p"), ("eos", "eos"),
                    ("stop", "stop"), ("lora_id", "lora_id"),
                    ("repetition_penalty", "repetition_penalty"),
                    ("presence_penalty", "presence_penalty"),
                    ("frequency_penalty", "frequency_penalty")):
                if k_http in body:
                    spec[k_engine] = body[k_http]
            if "logit_bias" in body:  # JSON keys are strings
                spec["logit_bias"] = {int(k): float(v) for k, v in
                                      body["logit_bias"].items()}
            try:
                rid, evq = api.submit_async(spec)
            except ValueError as e:
                return self._json(400, {"error": str(e)})

            if body.get("stream"):
                return self._stream_response(rid, evq)
            tokens, logprobs = [], []
            finished = False
            while not finished:
                kind, val = evq.get(timeout=600)
                if kind == "done":
                    break
                if kind == "token":
                    tok, lp, finished = val
                    tokens.append(tok)
                    logprobs.append(lp)
            req = api.engine.requests[rid]
            reason = "cancelled" if getattr(req, "cancelled", False) else (
                "stop" if len(tokens) < spec["max_new"] else "length")
            choice = {"tokens": tokens, "logprobs": logprobs,
                      "finish_reason": reason}
            if api.tokenizer is not None:
                choice["text"] = api.tokenizer.decode(tokens)
            is_chat = self.path == "/v1/chat/completions"
            if is_chat:
                end_id = api.tokenizer.special_id("<|im_end|>")
                shown = tokens[:-1] if (tokens and tokens[-1] == end_id) \
                    else tokens
                choice["message"] = {"role": "assistant",
                                     "content": api.tokenizer.decode(shown)}
            self._json(200, {
                "id": rid,
                "object": "chat.completion" if is_chat else "text_completion",
                "choices": [choice],
                "usage": {"prompt_tokens": int(prompt_ids.size),
                          "completion_tokens": len(tokens),
                          "total_tokens": int(prompt_ids.size) + len(tokens)},
            })

        def _stream_response(self, rid: int, evq: queue.Queue):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            carry = _Utf8Carry() if api.tokenizer is not None else None
            while True:
                kind, val = evq.get(timeout=600)
                if kind == "done":
                    self.wfile.write(b"data: [DONE]\n\n")
                    self.wfile.flush()
                    return
                tok, lp, finished = val
                ev = {"id": rid, "token": tok, "logprob": lp,
                      "finished": finished}
                if carry is not None:
                    ev["text"] = carry.feed(
                        api.tokenizer.decode_bytes([tok]))
                self.wfile.write(
                    b"data: " + json.dumps(ev).encode() + b"\n\n")
                self.wfile.flush()

    return Handler
