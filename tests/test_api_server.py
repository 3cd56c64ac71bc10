"""HTTP serving front-end (models/api_server.py): token/text completions,
SSE streaming, concurrency, cancellation, stats, UTF-8 carry."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from kfunca_tpu.models.api_server import ApiServer, _Utf8Carry
from kfunca_tpu.models.serve import InferenceServer
from kfunca_tpu.models.tokenizer import BPETokenizer
from kfunca_tpu.models.transformer import TransformerConfig, init_params


def small_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_heads", 2)
    kw.setdefault("n_layers", 2)
    kw.setdefault("d_ff", 64)
    kw.setdefault("dtype", "float32")
    return TransformerConfig(**kw)


def make_engine(cfg, params):
    return InferenceServer(params, cfg, batch_slots=2, n_pages=64,
                           page_size=8)


@pytest.fixture(scope="module")
def api():
    cfg = small_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    srv = ApiServer(make_engine(cfg, params), port=0).start()
    yield srv, cfg, params
    srv.shutdown()


def post(srv, path, body, stream=False):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    resp = urllib.request.urlopen(req, timeout=120)
    if stream:
        return resp
    return json.loads(resp.read())


def get(srv, path):
    return json.loads(urllib.request.urlopen(
        f"http://{srv.host}:{srv.port}{path}", timeout=30).read())


class TestCompletions:
    def test_token_completion_matches_direct_engine(self, api):
        srv, cfg, params = api
        prompt = list(range(1, 9))
        out = post(srv, "/v1/completions",
                   {"prompt": prompt, "max_tokens": 10})
        # greedy oracle on a fresh engine with the same weights
        oracle = make_engine(cfg, params)
        rid = oracle.submit(np.asarray(prompt, np.int32), max_new=10)
        oracle.run()
        assert out["choices"][0]["tokens"] == oracle.requests[rid].tokens
        assert out["usage"] == {"prompt_tokens": 8, "completion_tokens": 10,
                                "total_tokens": 18}
        assert out["choices"][0]["finish_reason"] == "length"
        assert len(out["choices"][0]["logprobs"]) == 10

    def test_streaming_sse_matches_nonstream(self, api):
        srv, _, _ = api
        prompt = list(range(2, 10))
        want = post(srv, "/v1/completions",
                    {"prompt": prompt, "max_tokens": 8})["choices"][0]["tokens"]
        resp = post(srv, "/v1/completions",
                    {"prompt": prompt, "max_tokens": 8, "stream": True},
                    stream=True)
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        toks, done = [], False
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                done = True
                break
            toks.append(json.loads(payload)["token"])
        assert done and toks == want

    def test_concurrent_requests(self, api):
        srv, _, _ = api
        results = {}

        def go(i):
            prompt = list(range(i + 1, i + 9))
            results[i] = post(srv, "/v1/completions",
                              {"prompt": prompt, "max_tokens": 6})

        threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert sorted(results) == [0, 1, 2]
        for i, out in results.items():
            assert len(out["choices"][0]["tokens"]) == 6
        # determinism across the concurrent batch: re-ask sequentially
        again = post(srv, "/v1/completions",
                     {"prompt": list(range(1, 9)), "max_tokens": 6})
        assert again["choices"][0]["tokens"] == results[0]["choices"][0]["tokens"]

    def test_sampling_params_forwarded(self, api):
        srv, _, _ = api
        out = post(srv, "/v1/completions",
                   {"prompt": list(range(8)), "max_tokens": 5,
                    "temperature": 0.8, "top_p": 0.9, "top_k": 20,
                    "repetition_penalty": 1.2,
                    "logit_bias": {"3": -100.0}})
        toks = out["choices"][0]["tokens"]
        assert len(toks) == 5 and 3 not in toks  # bias suppresses token 3

    def test_bad_requests(self, api):
        srv, _, _ = api
        for body, frag in (
                ({"prompt": 7}, "string or"),
                ({"prompt": "hi"}, "tokenizer"),
                ({"prompt": [1, 2], "lora_id": 5}, "lora")):
            with pytest.raises(urllib.error.HTTPError) as e:
                post(srv, "/v1/completions", body)
            assert e.value.code == 400
            assert frag in json.loads(e.value.read())["error"]

    def test_stats_and_models(self, api):
        srv, cfg, _ = api
        stats = get(srv, "/v1/stats")
        assert stats["completed"] >= 2 and "queued" in stats
        models = get(srv, "/v1/models")
        assert models["vocab_size"] == cfg.vocab_size
        assert models["text"] is False

    def test_cancel_endpoint(self, api):
        srv, _, _ = api
        # 8 + 120 = 128 tokens = exactly the per-seq page capacity (an
        # oversized request would be rejected-done before cancel lands)
        resp = post(srv, "/v1/completions",
                    {"prompt": list(range(8)), "max_tokens": 120,
                     "stream": True}, stream=True)
        first = resp.readline().decode().strip()
        rid = json.loads(first[len("data: "):])["id"]
        out = post(srv, "/v1/cancel", {"id": rid})
        assert out["cancelled"] is True
        lines = [ln.decode().strip() for ln in resp]
        assert "data: [DONE]" in lines  # stream terminates promptly
        assert post(srv, "/v1/cancel", {"id": rid})["cancelled"] is False


class TestTextMode:
    def test_text_in_text_out(self):
        cfg = small_cfg(vocab_size=300)
        params = init_params(jax.random.PRNGKey(1), cfg)
        tk = BPETokenizer.train("the sea rose and the wind sang " * 20, 300)
        srv = ApiServer(make_engine(cfg, params), tokenizer=tk,
                        port=0).start()
        try:
            out = post(srv, "/v1/completions",
                       {"prompt": "the sea", "max_tokens": 6})
            choice = out["choices"][0]
            assert choice["text"] == tk.decode(choice["tokens"])
            assert get(srv, "/v1/models")["text"] is True
            # streamed text deltas concatenate to the full decode
            resp = post(srv, "/v1/completions",
                        {"prompt": "the sea", "max_tokens": 6,
                         "stream": True}, stream=True)
            text, toks = "", []
            for raw in resp:
                line = raw.decode().strip()
                if not line.startswith("data: ") or line == "data: [DONE]":
                    if line == "data: [DONE]":
                        break
                    continue
                ev = json.loads(line[len("data: "):])
                text += ev["text"]
                toks.append(ev["token"])
            assert toks == choice["tokens"]
            assert text == tk.decode(choice["tokens"])
        finally:
            srv.shutdown()


class TestUtf8Carry:
    def test_split_multibyte(self):
        c = _Utf8Carry()
        data = "héllo ✓".encode()
        out = ""
        for i in range(len(data)):  # worst case: one byte at a time
            out += c.feed(data[i:i + 1])
        assert out == "héllo ✓"
        assert c.pending == b""

    def test_malformed_byte_flushes_replacement(self):
        c = _Utf8Carry()
        assert c.feed(b"ok\xff!") == "ok�!" or c.feed(b"") == "!"


class TestChat:
    def test_chat_completions_endpoint(self):
        cfg = small_cfg(vocab_size=300)
        params = init_params(jax.random.PRNGKey(2), cfg)
        tk = BPETokenizer.train("the sea rose and the wind sang " * 20,
                                296).with_special_tokens(
            ["<|im_start|>", "<|im_end|>"])
        assert tk.vocab_size <= 300
        srv = ApiServer(make_engine(cfg, params), tokenizer=tk,
                        port=0).start()
        try:
            out = post(srv, "/v1/chat/completions",
                       {"messages": [
                           {"role": "system", "content": "be brief"},
                           {"role": "user", "content": "the sea?"}],
                        "max_tokens": 8})
            assert out["object"] == "chat.completion"
            msg = out["choices"][0]["message"]
            assert msg["role"] == "assistant"
            # content excludes the end-of-turn marker
            assert "<|im_end|>" not in msg["content"]
            # template round-trip: the prompt the engine saw decodes back
            # to the ChatML rendering
            from kfunca_tpu.models.api_server import chatml_prompt

            ids = chatml_prompt(tk, [
                {"role": "system", "content": "be brief"},
                {"role": "user", "content": "the sea?"}])
            want = ("<|im_start|>system\nbe brief<|im_end|>\n"
                    "<|im_start|>user\nthe sea?<|im_end|>\n"
                    "<|im_start|>assistant\n")
            assert tk.decode(ids) == want
            # bad messages shape -> 400
            with pytest.raises(urllib.error.HTTPError) as e:
                post(srv, "/v1/chat/completions", {"messages": "hi"})
            assert e.value.code == 400
        finally:
            srv.shutdown()

    def test_chat_requires_chat_specials(self):
        cfg = small_cfg(vocab_size=300)
        params = init_params(jax.random.PRNGKey(2), cfg)
        tk = BPETokenizer.train("the sea " * 30, 280)  # no specials
        srv = ApiServer(make_engine(cfg, params), tokenizer=tk,
                        port=0).start()
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                post(srv, "/v1/chat/completions",
                     {"messages": [{"role": "user", "content": "x"}]})
            assert e.value.code == 400
            assert "special token" in json.loads(e.value.read())["error"]
        finally:
            srv.shutdown()
