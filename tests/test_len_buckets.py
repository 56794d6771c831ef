"""KV-length buckets (DecodeServer len_buckets=): the slot pool's cache
length tracks live demand — per-bucket compiled programs, pad/slice on
switch — without changing a single served token. (VERDICT r3 #5 lever;
experiments/kv_len_probe.py measures the economics on chip.)
"""

import numpy as np

from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

rng = np.random.default_rng(71)


def _p(n):
    return rng.integers(0, TINY.vocab_size, (n,)).astype(np.int64)


def _ref(prompt, n_new, max_len=48):
    gen = Generator(TINY, batch=1, prompt_len=prompt.size, max_len=max_len)
    out, _ = gen.generate(prompt[None, :], n_new)
    return [int(t) for t in out[0]]


def test_buckets_short_requests_stay_small_and_exact():
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=48,
                       len_buckets=(16, 48))
    try:
        outs = [srv.submit(_p(5), 6).result(timeout=300) for _ in range(3)]
        stats = srv.stats()
    finally:
        srv.stop()
    assert stats["cache_len"] == 16          # 5 + 6 + bucket-8 fits 16
    assert stats["cache_resizes"] == 0
    for o in outs:
        assert len(o) == 6


def test_buckets_grow_and_shrink_tokens_exact():
    """A long request grows the pool; its finish shrinks it back. Every
    request's tokens equal the un-bucketed server's (same graphs, same
    argmax) and the isolated generation."""
    kw = dict(slots=2, prompt_len=8, max_len=48)
    plain = DecodeServer(TINY, **kw)
    bux = DecodeServer(TINY, **kw, len_buckets=(16, 48))
    try:
        reqs = [(_p(5), 6), (_p(6), 30), (_p(4), 5)]  # mid one needs 48
        p_out = [plain.submit(p, n) for p, n in reqs]
        b_out = [bux.submit(p, n) for p, n in reqs]
        for (p, n), pf, bf in zip(reqs, p_out, b_out):
            a = pf.result(timeout=300)
            b = bf.result(timeout=300)
            assert a == b == _ref(p, n), (p.size, n)
        resizes_mid = bux.stats()["cache_resizes"]
        assert resizes_mid >= 1              # grew for the long request
        # after the long one drains, a short request shrinks the pool
        p4 = _p(4)
        out = bux.submit(p4, 4).result(timeout=300)
        assert out == _ref(p4, 4)
        assert bux.stats()["cache_len"] == 16
    finally:
        plain.stop()
        bux.stop()


def test_buckets_chunked_multi_step_exact():
    """len_buckets composes with chunked_prefill x multi_step (the device
    block recompiles per bucket, prompt buffer stays max-sized)."""
    kw = dict(slots=2, max_len=48, chunked_prefill=True, chunk=4,
              multi_step=2)
    plain = DecodeServer(TINY, **kw)
    bux = DecodeServer(TINY, **kw, len_buckets=(16, 48))
    try:
        reqs = [(_p(9), 5), (_p(3), 28), (_p(7), 4)]
        p_res = [plain.submit(p, n).result(timeout=300) for p, n in reqs]
        b_res = [bux.submit(p, n).result(timeout=300) for p, n in reqs]
    finally:
        plain.stop()
        bux.stop()
    assert b_res == p_res


def test_buckets_int8_kv_bucketed_prefill():
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=48,
                       kv_dtype="int8", len_buckets=(16, 48))
    try:
        out = srv.submit(_p(5), 6).result(timeout=300)
        long_out = srv.submit(_p(6), 30).result(timeout=300)
    finally:
        srv.stop()
    assert len(out) == 6 and len(long_out) == 30


def test_buckets_validation():
    import pytest

    with pytest.raises(ValueError, match="max_len"):
        DecodeServer(TINY, slots=1, prompt_len=4, max_len=32,
                     len_buckets=(8, 16))


def test_buckets_chunked_int8_shadow_calibration():
    """len_buckets x chunked int8 (round-4 verdict item 4): the shadow
    fp32 calibration phase pins the cache to max_len; buckets engage
    after the flip and the tokens match the bucket-free chunked-int8
    server exactly (same calibration prompt => same scales)."""
    p1, p2 = _p(5), _p(9)
    outs = []
    for lb in (None, (16, 48)):
        srv = DecodeServer(TINY, slots=2, max_len=48, kv_dtype="int8",
                           chunked_prefill=True, chunk=4, len_buckets=lb)
        try:
            f1 = srv.submit(p1, 6)
            f2 = srv.submit(p2, 6)
            outs.append((f1.result(timeout=300), f2.result(timeout=300)))
            stats = srv.stats()
        finally:
            srv.stop()
    assert outs[0] == outs[1]
    assert stats["cache_len"] == 16          # shrank after the flip


def test_buckets_chunked_int4():
    """len_buckets x chunked x int4: same calibration pinning, packed
    cache resizes across buckets without changing served tokens."""
    p = _p(6)
    outs = []
    for lb in (None, (16, 48)):
        srv = DecodeServer(TINY, slots=2, max_len=48, kv_dtype="int4",
                           chunked_prefill=True, chunk=4, len_buckets=lb)
        try:
            outs.append(srv.generate(p, 6, timeout=300))
        finally:
            srv.stop()
    assert outs[0] == outs[1]
