"""Continuous-batching server tests."""

import threading

import numpy as np

import onnx_rusty_inference_engine_tpu as oriet
from onnx_rusty_inference_engine_tpu.serve import InferenceServer

rng = np.random.default_rng(3)


def _mnist_server(**kw):
    graph = oriet.import_onnx("/root/reference/models/mnist-8.onnx")
    eng = oriet.Engine(graph)
    return eng, InferenceServer(eng, batch_buckets=(1, 2, 4, 8), **kw)


def test_single_request_roundtrip():
    eng, srv = _mnist_server()
    try:
        x = rng.standard_normal((1, 1, 28, 28)).astype(np.float32) * 10
        out = srv.infer(x, timeout=120)
        want = np.asarray(eng({"Input3": x})["Plus214_Output_0"])
        np.testing.assert_allclose(out["Plus214_Output_0"], want, rtol=1e-4,
                                   atol=1e-4)
    finally:
        srv.stop()


def test_concurrent_requests_batched_and_correct():
    eng, srv = _mnist_server(max_delay_s=0.05)
    try:
        xs = [rng.standard_normal((1, 1, 28, 28)).astype(np.float32) * 10
              for _ in range(13)]
        futures = [srv.submit(x) for x in xs]
        outs = [f.result(timeout=120) for f in futures]
        for x, o in zip(xs, outs):
            want = np.asarray(eng({"Input3": x})["Plus214_Output_0"])
            np.testing.assert_allclose(o["Plus214_Output_0"], want,
                                       rtol=1e-4, atol=1e-4)
        s = srv.stats.summary()
        assert s["requests"] == 13
        assert s["batches"] < 13  # actually batched, not one-by-one
    finally:
        srv.stop()


def test_multithreaded_clients():
    eng, srv = _mnist_server(max_delay_s=0.01)
    results = {}
    try:
        def client(i):
            x = np.full((1, 1, 28, 28), float(i), np.float32)
            results[i] = srv.infer(x, timeout=120)["Plus214_Output_0"]

        threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 8
        # distinct inputs -> results must not be cross-wired
        for i in (0, 3, 7):
            x = np.full((1, 1, 28, 28), float(i), np.float32)
            want = np.asarray(eng({"Input3": x})["Plus214_Output_0"])
            np.testing.assert_allclose(results[i], want, rtol=1e-4, atol=1e-4)
    finally:
        srv.stop()


def test_request_level_failure_isolation():
    eng, srv = _mnist_server()
    try:
        bad = np.zeros((1, 1, 13, 13), np.float32)  # wrong spatial dims
        f = srv.submit(bad)
        try:
            f.result(timeout=120)
            raised = False
        except Exception:
            raised = True
        assert raised
        # server still serves good requests afterwards
        x = rng.standard_normal((1, 1, 28, 28)).astype(np.float32)
        out = srv.infer(x, timeout=120)
        assert out["Plus214_Output_0"].shape == (1, 10)
    finally:
        srv.stop()


def test_multi_input_model_serving():
    """Continuous batching for multi-input models (BERT-style feeds)."""
    import numpy as np

    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models.bert import TINY, build_bert
    from onnx_rusty_inference_engine_tpu.serve import InferenceServer

    rng2 = np.random.default_rng(17)
    B, T = 1, 6
    g = import_model(build_bert(TINY, batch=4, seq_len=T))
    eng = Engine(g)
    srv = InferenceServer(eng, batch_buckets=(1, 2, 4), max_delay_s=0.02)
    try:
        feeds = []
        for _ in range(5):
            feeds.append({
                "input_ids": rng2.integers(0, TINY.vocab_size, (T,)),
                "token_type_ids": rng2.integers(0, 2, (T,)),
                "attention_mask": np.ones((T,), np.int64),
            })
        futs = [srv.submit(f) for f in feeds]
        outs = [fu.result(timeout=300) for fu in futs]
    finally:
        srv.stop()
    # compare request 0 against a direct single-batch run
    single = Engine(import_model(build_bert(TINY, batch=1, seq_len=T)))
    want = single.run({k: np.asarray(v)[None] for k, v in feeds[0].items()})
    np.testing.assert_allclose(outs[0]["pooler_output"],
                               want["pooler_output"], rtol=1e-4, atol=1e-4)
