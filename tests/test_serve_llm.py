"""Continuous-batching decode server: slot recycling, per-slot positions,
exactness vs isolated generation."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

rng = np.random.default_rng(53)


def _reference_tokens(prompt: np.ndarray, n_new: int, prompt_len: int,
                      max_len: int) -> list:
    """Isolated greedy generation with the same seeded weights."""
    gen = Generator(TINY, batch=1, prompt_len=prompt.size, max_len=max_len)
    toks, _ = gen.generate(prompt[None], n_new)
    return list(toks[0])


def test_decode_server_matches_isolated_generation():
    """Six staggered requests over four slots — every sequence must equal
    its isolated (unbatched, unpadded) greedy generation exactly."""
    srv = DecodeServer(TINY, slots=4, prompt_len=8, max_len=24)
    try:
        reqs = []
        for i in range(6):
            plen = int(rng.integers(2, 9))
            n_new = int(rng.integers(2, 7))
            prompt = rng.integers(0, TINY.vocab_size, (plen,)).astype(np.int64)
            reqs.append((prompt, n_new, srv.submit(prompt, n_new)))
        for prompt, n_new, fut in reqs:
            got = fut.result(timeout=300)
            want = _reference_tokens(prompt, n_new, 8, 24)
            assert got == want, (prompt, got, want)
    finally:
        srv.stop()
    assert srv.tokens_out > 0
    # continuous batching actually batched: fewer steps than total new tokens
    total_new = sum(n for _, n, _ in reqs)
    assert srv.steps < total_new


def test_decode_server_slot_reuse():
    """More requests than slots forces recycling; all must complete."""
    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=16)
    try:
        prompts = [rng.integers(0, TINY.vocab_size, (3,)).astype(np.int64)
                   for _ in range(5)]
        futs = [srv.submit(p, 4) for p in prompts]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        srv.stop()
    for p, got in zip(prompts, outs):
        assert got == _reference_tokens(p, 4, 4, 16)


def test_decode_server_int8_kv():
    """INT8 in-graph KV cache: greedy tokens stay (mostly) unchanged."""
    prompt = rng.integers(0, TINY.vocab_size, (5,)).astype(np.int64)
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24,
                       kv_dtype="int8")
    try:
        got = srv.generate(prompt, 6, timeout=300)
    finally:
        srv.stop()
    want = _reference_tokens(prompt, 6, 8, 24)
    agree = np.mean([g == w for g, w in zip(got, want)])
    assert agree >= 0.5, (got, want)


def test_decode_server_sharded():
    """Continuous batching over a tensor-sharded (model=4) mesh: served
    tokens still match isolated generation exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P_

    from onnx_rusty_inference_engine_tpu.parallel import make_mesh

    mesh = make_mesh({"data": 1, "model": 4})

    def shard(name, arr):
        if arr.ndim == 2 and arr.shape[-1] % 4 == 0:
            return NamedSharding(mesh, P_(None, "model"))
        return NamedSharding(mesh, P_())

    prompt = rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
    with mesh:
        srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=16,
                           mesh=mesh, param_sharding_fn=shard)
        try:
            got = srv.generate(prompt, 4, timeout=300)
        finally:
            srv.stop()
    assert got == _reference_tokens(prompt, 4, 8, 16)


def test_decode_server_stats():
    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=12)
    try:
        futs = [srv.submit(rng.integers(0, TINY.vocab_size, (3,)).astype(
            np.int64), 3) for _ in range(3)]
        for f in futs:
            f.result(timeout=300)
    finally:
        srv.stop()
    s = srv.stats()
    assert s["requests"] == 3
    assert s["tokens_out"] >= 6  # decode-step tokens (first token is prefill)
    assert 0 < s["mean_slot_occupancy"] <= 1
    assert s["p99_latency_s"] >= s["p50_latency_s"] > 0


def test_decode_server_prompt_buckets():
    """Prompts route to the smallest compiled prefill bucket; results stay
    exactly equal to isolated generation regardless of bucket padding."""
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24,
                       prompt_buckets=(2, 4, 8))
    try:
        reqs = []
        for plen in (2, 3, 5, 8):
            prompt = rng.integers(0, TINY.vocab_size, (plen,)).astype(np.int64)
            reqs.append((prompt, srv.submit(prompt, 3)))
        for prompt, fut in reqs:
            assert fut.result(timeout=300) == _reference_tokens(
                prompt, 3, 8, 24)
        # only the needed buckets were compiled
        assert set(srv._prefill_engines) <= {2, 4, 8}
        assert len(srv._prefill_engines) >= 2
    finally:
        srv.stop()


def test_decode_server_eos_stop():
    """Generation stops at eos_id and frees the slot early."""
    prompt = rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
    ref = _reference_tokens(prompt, 6, 8, 24)
    eos = ref[2]
    stop_at = ref.index(eos)  # greedy tiny models may repeat tokens
    srv = DecodeServer(TINY, slots=1, prompt_len=8, max_len=24)
    try:
        got = srv.generate(prompt, 6, timeout=300, eos_id=eos)
    finally:
        srv.stop()
    assert got == ref[: stop_at + 1]
    assert got[-1] == eos


def test_decode_server_concurrent_clients():
    """Many client threads submitting simultaneously: every request completes
    with its exact isolated-generation tokens."""
    import threading

    srv = DecodeServer(TINY, slots=4, prompt_len=6, max_len=20)
    prompts = [rng.integers(0, TINY.vocab_size, (int(rng.integers(2, 7)),))
               .astype(np.int64) for _ in range(12)]
    results = [None] * len(prompts)

    def client(i):
        results[i] = srv.generate(prompts[i], 4, timeout=300)

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
    finally:
        srv.stop()
    for p, got in zip(prompts, results):
        assert got == _reference_tokens(p, 4, 6, 20)
    assert srv.stats()["requests"] == len(prompts)


def test_decode_server_stop_sequences():
    """Generation halts when the emitted tail matches a stop sequence;
    the matched tokens are included in the result."""
    prompt = rng.integers(0, TINY.vocab_size, (5,)).astype(np.int64)
    ref = [int(t) for t in _reference_tokens(prompt, 8, 8, 24)]
    stop = [ref[:3]]  # earliest possible match: the first 3 tokens
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24)
    try:
        got = srv.submit(prompt, 8, stop_sequences=stop).result(timeout=300)
    finally:
        srv.stop()
    assert got == ref[:3], (got, ref)


def test_chunked_prefill_matches_isolated_generation():
    """chunked_prefill=True: ONE chunk graph serves mixed prefill/decode
    steps — no per-bucket prefill engines, prompts longer than any
    'prompt_len' admitted. Served tokens must equal isolated generation
    exactly, including under staggered admissions."""
    srv = DecodeServer(TINY, slots=3, prompt_len=8, max_len=40,
                       chunked_prefill=True, chunk=4)
    try:
        reqs = []
        for i in range(6):
            plen = int(rng.integers(2, 20))   # > prompt_len allowed
            n_new = int(rng.integers(2, 8))
            prompt = rng.integers(0, TINY.vocab_size, (plen,)).astype(
                np.int64)
            reqs.append((prompt, n_new, srv.submit(prompt, n_new)))
        for prompt, n_new, fut in reqs:
            got = fut.result(timeout=300)
            want = _reference_tokens(prompt, n_new, prompt.size, 40)
            assert got == want, (prompt.size, got, want)
    finally:
        srv.stop()
    assert srv.steps > 0 and srv.tokens_out > 0



def test_chunked_prefill_int8_kv():
    """Chunked prefill + int8 KV: shadow-fp32 calibration on the first
    prompt, then the int8 graph; tokens stay (mostly) equal to isolated
    fp32 generation."""
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=32,
                       chunked_prefill=True, chunk=4, kv_dtype="int8")
    try:
        prompts = [rng.integers(0, TINY.vocab_size, (int(p),)).astype(
            np.int64) for p in (6, 11)]
        futs = [srv.submit(p, 6) for p in prompts]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        srv.stop()
    for p, got in zip(prompts, outs):
        want = _reference_tokens(p, 6, p.size, 32)
        agree = np.mean([g == w for g, w in zip(got, want)])
        assert agree >= 0.5, (p.size, got, want)


def test_multi_step_server_matches_isolated_generation():
    """multi_step=3: three decode steps per dispatch; emitted tokens must
    still equal isolated generation exactly, across staggered admission
    and mid-block finishes."""
    srv = DecodeServer(TINY, slots=3, prompt_len=8, max_len=24,
                       multi_step=3)
    try:
        reqs = []
        for i in range(5):
            plen = int(rng.integers(2, 9))
            n_new = int(rng.integers(2, 8))   # deliberately not % 3
            prompt = rng.integers(0, TINY.vocab_size, (plen,)
                                  ).astype(np.int64)
            reqs.append((prompt, n_new, srv.submit(prompt, n_new)))
        for prompt, n_new, fut in reqs:
            got = fut.result(timeout=300)
            want = _reference_tokens(prompt, n_new, 8, 24)
            assert got == want, (prompt, got, want)
        assert srv.steps < sum(n for _, n, _ in reqs)
    finally:
        srv.stop()


def test_multi_step_server_int8_kv_and_eos():
    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=24,
                       kv_dtype="int8", multi_step=4)
    try:
        p = rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
        ref = srv.generate(p, 10, timeout=300)
        eos = ref[4]
        got = srv.generate(p, 10, eos_id=eos, timeout=300)
        stop = ref.index(eos)             # first occurrence wins
        assert got == ref[: stop + 1]     # stops mid-block at the eos
    finally:
        srv.stop()


def test_chunked_rejects_prefill_dtype():
    """chunked_prefill has no prefill engines (prompts ride the decode
    chunk graph) so prefill_dtype would be a silent no-op — the server
    must reject the combination rather than quietly ignore the knob."""
    import pytest

    with pytest.raises(ValueError, match="prefill_dtype"):
        DecodeServer(TINY, slots=2, max_len=24, chunked_prefill=True,
                     chunk=4, prefill_dtype="w8a8", autostart=False)
