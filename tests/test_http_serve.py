"""HTTP serving front end tests."""

import json
import urllib.request

import numpy as np

import onnx_rusty_inference_engine_tpu as oriet
from onnx_rusty_inference_engine_tpu.http_serve import serve_http

rng = np.random.default_rng(31)


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST")
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=60) as r:
        return r.status, json.loads(r.read())


def test_http_infer_roundtrip():
    graph = oriet.import_onnx("/root/reference/models/mnist-8.onnx")
    eng = oriet.Engine(graph)
    httpd, batcher = serve_http(eng, port=18231, block=False,
                                batch_buckets=(1, 2, 4))
    try:
        port = httpd.server_address[1]
        status, health = _get(port, "/healthz")
        assert status == 200 and health["status"] == "ok"

        x = (rng.standard_normal((1, 1, 28, 28)) * 10).astype(np.float32)
        status, resp = _post(port, "/v1/infer", {"input": x.tolist()})
        assert status == 200
        got = np.asarray(resp["outputs"]["Plus214_Output_0"])
        want = np.asarray(eng({"Input3": x})["Plus214_Output_0"])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

        # malformed request -> 400, server stays up
        status, resp = _post(port, "/v1/infer", {"input": [[1, 2, 3]]})
        assert status == 400 and "error" in resp

        status, stats = _get(port, "/v1/stats")
        assert status == 200 and stats["requests"] >= 1
    finally:
        httpd.shutdown()
        batcher.stop()


def test_http_generate_endpoint():
    """POST /v1/generate over the continuous-batching decode server."""
    import json
    import urllib.request

    import numpy as np

    from onnx_rusty_inference_engine_tpu.http_serve import serve_generate_http
    from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
    from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer
    from onnx_rusty_inference_engine_tpu.generate import Generator

    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=12)
    httpd = serve_generate_http(srv, port=0, block=False)
    port = httpd.server_address[1]
    try:
        prompt = [3, 1, 4, 1]
        body = json.dumps({"prompt_ids": prompt,
                           "max_new_tokens": 4}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            resp = json.loads(r.read())
        gen = Generator(TINY, batch=1, prompt_len=4, max_len=12)
        want, _ = gen.generate(np.asarray([prompt], np.int64), 4)
        assert resp["generated_ids"] == list(want[0])
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/stats", timeout=60) as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 1
    finally:
        httpd.shutdown()
        srv.stop()


def test_http_generate_seq2seq_family():
    """The /v1/generate front end serves Seq2SeqServer too (shared
    _ServerBase): token prompt for t5, with stats exposed."""
    from onnx_rusty_inference_engine_tpu.http_serve import (
        serve_generate_http,
    )
    from onnx_rusty_inference_engine_tpu.models.t5 import TINY
    from onnx_rusty_inference_engine_tpu.serve_llm import Seq2SeqServer

    srv = Seq2SeqServer(TINY, slots=2, src_len=8, max_len=16)
    httpd = serve_generate_http(srv, port=0, block=False)
    port = httpd.server_address[1]
    try:
        status, out = _post(port, "/v1/generate",
                            {"src": [3, 5, 7], "max_new_tokens": 4})
        assert status == 200
        assert len(out["generated_ids"]) == 4
        status, stats = _get(port, "/v1/stats")
        assert stats["requests"] == 1
    finally:
        httpd.shutdown()
        srv.stop()


def test_http_generate_sampling_params():
    """temperature/top_k/top_p/seed ride the JSON body; same seed gives
    the same stream, top_k=1 reduces to greedy."""
    from onnx_rusty_inference_engine_tpu.http_serve import serve_generate_http
    from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
    from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=12)
    httpd = serve_generate_http(srv, port=0, block=False)
    port = httpd.server_address[1]
    try:
        base = {"prompt_ids": [3, 1, 4, 1], "max_new_tokens": 4}
        _, greedy = _post(port, "/v1/generate", base)
        _, tk1 = _post(port, "/v1/generate",
                       {**base, "temperature": 1.5, "top_k": 1, "seed": 2})
        assert tk1["generated_ids"] == greedy["generated_ids"]
        _, s1 = _post(port, "/v1/generate",
                      {**base, "temperature": 1.0, "seed": 11})
        _, s2 = _post(port, "/v1/generate",
                      {**base, "temperature": 1.0, "seed": 11})
        assert s1["generated_ids"] == s2["generated_ids"]
    finally:
        httpd.shutdown()
        srv.stop()


def test_http_generate_streaming():
    """{"stream": true} returns chunked NDJSON: one {"token": t} line per
    token, then {"done": true} with the full list — equal to the
    non-streamed greedy result."""
    from onnx_rusty_inference_engine_tpu.http_serve import serve_generate_http
    from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
    from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=12)
    httpd = serve_generate_http(srv, port=0, block=False)
    port = httpd.server_address[1]
    try:
        base = {"prompt_ids": [3, 1, 4, 1], "max_new_tokens": 4}
        _, plain = _post(port, "/v1/generate", base)
        body = json.dumps({**base, "stream": True}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            lines = [json.loads(ln) for ln in r.read().splitlines() if ln]
    finally:
        httpd.shutdown()
        srv.stop()
    toks = [ln["token"] for ln in lines if "token" in ln]
    done = [ln for ln in lines if ln.get("done")]
    assert toks == plain["generated_ids"]
    assert done and done[0]["generated_ids"] == plain["generated_ids"]


def test_http_metrics_endpoints():
    """/metrics serves Prometheus text exposition on both front ends."""
    from onnx_rusty_inference_engine_tpu.http_serve import serve_generate_http
    from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
    from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=12)
    httpd = serve_generate_http(srv, port=0, block=False)
    port = httpd.server_address[1]
    try:
        _post(port, "/v1/generate",
              {"prompt_ids": [1, 2, 3], "max_new_tokens": 2})
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=60) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
    finally:
        httpd.shutdown()
        srv.stop()
    assert "oriet_requests 1" in text
    assert "oriet_tokens_out" in text
    assert "# TYPE oriet_requests gauge" in text


def test_http_speculative_server():
    """The generation front end serves SpeculativeServer too (shared
    _ServerBase); unsupported knobs surface as clean 400s."""
    import dataclasses

    from onnx_rusty_inference_engine_tpu.generate import Generator
    from onnx_rusty_inference_engine_tpu.http_serve import serve_generate_http
    from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
    from onnx_rusty_inference_engine_tpu.serve_llm import SpeculativeServer

    srv = SpeculativeServer(TINY, dataclasses.replace(TINY, n_layer=1),
                            slots=2, prompt_len=6, max_len=32, k=3)
    httpd = serve_generate_http(srv, port=0, block=False)
    port = httpd.server_address[1]
    try:
        prompt = [3, 1, 4, 1]
        status, out = _post(port, "/v1/generate",
                            {"prompt_ids": prompt, "max_new_tokens": 4})
        assert status == 200
        gen = Generator(TINY, batch=1, prompt_len=4, max_len=32)
        want = [int(t) for t in
                gen.generate(np.asarray([prompt], np.int64), 4)[0][0]]
        assert out["generated_ids"] == want       # lossless over HTTP
        status, err = _post(port, "/v1/generate",
                            {"prompt_ids": prompt, "max_new_tokens": 4,
                             "top_k": 5})
        assert status == 400 and "DecodeServer" in err["error"]
        status, stats = _get(port, "/v1/stats")
        assert "acceptance_rate" in stats
    finally:
        httpd.shutdown()
        srv.stop()


def test_http_stream_client_disconnect_cancels_request():
    """ADVICE r3: a client hanging up mid-stream must cancel the
    server-side request so the slot is reclaimed — not left decoding to
    max_new_tokens into an orphaned queue."""
    import socket
    import time

    from onnx_rusty_inference_engine_tpu.http_serve import serve_generate_http
    from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
    from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

    srv = DecodeServer(TINY, slots=1, prompt_len=4, max_len=512)
    httpd = serve_generate_http(srv, port=0, block=False)
    port = httpd.server_address[1]
    try:
        body = json.dumps({"prompt_ids": [1, 2, 3], "max_new_tokens": 400,
                           "stream": True}).encode()
        s = socket.create_connection(("127.0.0.1", port), timeout=120)
        s.sendall(b"POST /v1/generate HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Type: application/json\r\n"
                  + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        # read until at least one token line arrived, then hang up hard
        buf = b""
        while b'"token"' not in buf:
            chunk = s.recv(4096)
            assert chunk, "stream closed before any token"
            buf += chunk
        s.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                     __import__("struct").pack("ii", 1, 0))  # RST on close
        s.close()
        # the single slot must become free well before 400 tokens finish:
        # a follow-up request on the same slot pool completes promptly
        deadline = time.time() + 300
        fut = srv.submit(np.array([4, 5, 6], np.int64), 3)
        out = fut.result(timeout=max(1.0, deadline - time.time()))
        assert len(out) == 3
        # the orphan was CANCELLED, not run to completion: with one slot,
        # an uncancelled orphan would have finished (requests == 2) before
        # the follow-up could even start
        assert srv.stats()["requests"] == 1
        assert not srv._active() or srv._req[0] is None
    finally:
        httpd.shutdown()
        srv.stop()
