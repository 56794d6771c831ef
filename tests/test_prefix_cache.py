"""Prompt/prefix KV cache (serve_llm.DecodeServer(prompt_cache=N)).

Bucketed-prefill mode replays EXACT prompt matches (whole prefill
skipped); chunked-prefill mode transfers the longest COMMON prefix's KV
rows (causal: row t depends only on tokens <= t) so shared system prompts
stream only their suffix. Served tokens must stay EXACTLY the isolated
generation either way."""

import numpy as np

from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

rng = np.random.default_rng(7)


def _reference_tokens(prompt: np.ndarray, n_new: int, max_len: int) -> list:
    gen = Generator(TINY, batch=1, prompt_len=prompt.size, max_len=max_len)
    toks, _ = gen.generate(prompt[None], n_new)
    return list(toks[0])


def test_exact_prompt_cache_replay():
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24,
                       prompt_cache=8)
    try:
        prompt = rng.integers(0, TINY.vocab_size, (6,)).astype(np.int64)
        want = _reference_tokens(prompt, 5, 24)
        cold = srv.submit(prompt, 5).result(timeout=300)
        warm = srv.submit(prompt, 5).result(timeout=300)
    finally:
        srv.stop()
    assert cold == want
    assert warm == want
    st = srv.stats()
    assert st["prefix_hits"] == 1
    assert st["prefix_tokens_saved"] == prompt.size


def test_exact_prompt_cache_int8_kv():
    """Entries store cache-dtype (int8) KV, so replay is bit-identical."""
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24,
                       kv_dtype="int8", prompt_cache=4)
    try:
        prompt = rng.integers(0, TINY.vocab_size, (7,)).astype(np.int64)
        cold = srv.submit(prompt, 6).result(timeout=300)
        warm = srv.submit(prompt, 6).result(timeout=300)
    finally:
        srv.stop()
    assert warm == cold
    assert srv.prefix_hits == 1


def test_chunked_prefix_reuse_shared_system_prompt():
    """p2 shares a 10-token system prefix with p1: its admission reuses
    those KV rows and streams only the 3-token suffix — tokens still
    exactly match isolated generation."""
    sys_prefix = rng.integers(0, TINY.vocab_size, (10,)).astype(np.int64)
    a = rng.integers(0, TINY.vocab_size, (3,)).astype(np.int64)
    b = (a + 1) % TINY.vocab_size  # diverges at the first suffix token
    p1 = np.concatenate([sys_prefix, a])
    p2 = np.concatenate([sys_prefix, b])

    srv = DecodeServer(TINY, slots=2, max_len=32, chunked_prefill=True,
                       chunk=4, prompt_cache=4)
    try:
        got1 = srv.submit(p1, 5).result(timeout=300)
        got2 = srv.submit(p2, 5).result(timeout=300)
    finally:
        srv.stop()
    assert got1 == _reference_tokens(p1, 5, 32)
    assert got2 == _reference_tokens(p2, 5, 32)
    st = srv.stats()
    assert st["prefix_hits"] == 1
    assert st["prefix_tokens_saved"] == sys_prefix.size


def test_chunked_exact_resubmission_streams_one_token():
    """An identical prompt leaves exactly one token to stream (it must
    produce the first-token logits)."""
    prompt = rng.integers(0, TINY.vocab_size, (9,)).astype(np.int64)
    srv = DecodeServer(TINY, slots=2, max_len=32, chunked_prefill=True,
                       chunk=4, prompt_cache=4)
    try:
        cold = srv.submit(prompt, 4).result(timeout=300)
        warm = srv.submit(prompt, 4).result(timeout=300)
    finally:
        srv.stop()
    assert warm == cold == _reference_tokens(prompt, 4, 32)
    assert srv.prefix_tokens_saved == prompt.size - 1


def test_prompt_cache_lru_eviction():
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24,
                       prompt_cache=1)
    try:
        p1 = rng.integers(0, TINY.vocab_size, (5,)).astype(np.int64)
        p2 = rng.integers(0, TINY.vocab_size, (5,)).astype(np.int64)
        srv.submit(p1, 3).result(timeout=300)
        srv.submit(p2, 3).result(timeout=300)   # evicts p1
        got = srv.submit(p1, 3).result(timeout=300)  # miss, recomputed
    finally:
        srv.stop()
    assert got == _reference_tokens(p1, 3, 24)
    assert srv.prefix_hits == 0
    assert len(srv._pcache) == 1


def test_prompt_cache_off_by_default():
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=16)
    try:
        p = rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
        srv.submit(p, 2).result(timeout=300)
        srv.submit(p, 2).result(timeout=300)
    finally:
        srv.stop()
    assert len(srv._pcache) == 0
    assert "prefix_hits" not in srv.stats()
