"""Chunked decode + greedy speculative decoding.

The invariants that matter:
1. chunk-decode(k tokens) == k sequential single-token decodes (logits
   AND cache bits), fp32 and int8 KV, at per-slot positions;
2. speculative output == the target's plain greedy decode EXACTLY, for
   any draft (greedy verification is lossless — the draft only changes
   the call count).
"""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.generate import (Generator,
                                                      SpeculativeGenerator)
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.gpt2 import (GPT2Config, TINY,
                                                         build_gpt2_decode)

rng = np.random.default_rng(23)


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_chunk_decode_matches_sequential(kv_dtype):
    B, L, K = 2, 16, 4
    H, hd = TINY.n_head, TINY.head_dim
    g1 = Engine(import_model(build_gpt2_decode(TINY, batch=B, max_len=L,
                                               kv_dtype=kv_dtype)))
    gk = Engine(import_model(build_gpt2_decode(TINY, batch=B, max_len=L,
                                               kv_dtype=kv_dtype, chunk=K)))
    base = {}
    for i in range(TINY.n_layer):
        for kind in ("key", "value"):
            if kv_dtype == "int8":
                base[f"past_{kind}_{i}"] = rng.integers(
                    -127, 127, (B, H, L, hd)).astype(np.int8)
                base[f"kv_scale_{kind}_{i}"] = np.full((H,), 0.02,
                                                       np.float32)
            else:
                base[f"past_{kind}_{i}"] = rng.standard_normal(
                    (B, H, L, hd)).astype(np.float32)
    toks = rng.integers(0, TINY.vocab_size, (B, K)).astype(np.int64)
    pos0 = np.array([5, 3], dtype=np.int64)   # per-slot offsets differ

    seq_cache = dict(base)
    seq_logits = []
    for j in range(K):
        feed = {"input_ids": toks[:, j:j + 1], "pos": pos0 + j, **seq_cache}
        out = g1(feed)
        seq_logits.append(np.asarray(out["logits"]))
        for i in range(TINY.n_layer):
            for kind in ("key", "value"):
                seq_cache[f"past_{kind}_{i}"] = out[f"present_{kind}_{i}"]
    seq_logits = np.concatenate(seq_logits, axis=1)

    outk = gk({"input_ids": toks, "pos": pos0, **base})
    np.testing.assert_allclose(np.asarray(outk["logits"]), seq_logits,
                               rtol=1e-5, atol=1e-5)
    for i in range(TINY.n_layer):
        for kind in ("key", "value"):
            np.testing.assert_allclose(
                np.asarray(outk[f"present_{kind}_{i}"]).astype(np.float32),
                np.asarray(seq_cache[f"past_{kind}_{i}"]).astype(
                    np.float32), atol=1e-4)


def test_speculative_lossless_same_draft():
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)
    ref, _ = Generator(TINY, batch=2, prompt_len=4,
                       max_len=32).generate(ids, 10)
    sg = SpeculativeGenerator(TINY, batch=2, prompt_len=4, max_len=32,
                              k=4, target_seed=0, draft_seed=0)
    toks, _ = sg.generate(ids, 10)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))
    assert sg.acceptance_rate > 0.5  # near-identical draft accepts most


def test_speculative_lossless_small_draft():
    """A 1-layer draft with different weights: output must STILL equal
    the target's own greedy decode (the whole point of verification)."""
    draft = GPT2Config(n_layer=1, n_head=TINY.n_head, n_embd=TINY.n_embd,
                       vocab_size=TINY.vocab_size,
                       n_positions=TINY.n_positions)
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)
    ref, _ = Generator(TINY, batch=2, prompt_len=4,
                       max_len=32).generate(ids, 10)
    sg = SpeculativeGenerator(TINY, draft, batch=2, prompt_len=4,
                              max_len=32, k=4, target_seed=0, draft_seed=9)
    toks, _ = sg.generate(ids, 10)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))
    assert 0.0 <= sg.acceptance_rate <= 1.0


def test_llama_chunk_decode_matches_sequential():
    from onnx_rusty_inference_engine_tpu.models.llama import (
        TINY as LT, build_llama_decode)

    B, L, K = 2, 16, 3
    Hkv, hd = LT.n_kv_head, LT.head_dim
    g1 = Engine(import_model(build_llama_decode(LT, batch=B, max_len=L,
                                                kv_dtype="int8")))
    gk = Engine(import_model(build_llama_decode(LT, batch=B, max_len=L,
                                                kv_dtype="int8", chunk=K)))
    base = {}
    for i in range(LT.n_layer):
        for kind in ("key", "value"):
            base[f"past_{kind}_{i}"] = rng.integers(
                -127, 127, (B, Hkv, L, hd)).astype(np.int8)
            base[f"kv_scale_{kind}_{i}"] = np.full((Hkv,), 0.02, np.float32)
    toks = rng.integers(0, LT.vocab_size, (B, K)).astype(np.int64)
    pos0 = np.array([6, 2], dtype=np.int64)
    seq_cache = dict(base)
    seq_logits = []
    for j in range(K):
        out = g1({"input_ids": toks[:, j:j + 1], "pos": pos0 + j,
                  **seq_cache})
        seq_logits.append(np.asarray(out["logits"]))
        for i in range(LT.n_layer):
            for kind in ("key", "value"):
                seq_cache[f"past_{kind}_{i}"] = out[f"present_{kind}_{i}"]
    outk = gk({"input_ids": toks, "pos": pos0, **base})
    np.testing.assert_allclose(np.asarray(outk["logits"]),
                               np.concatenate(seq_logits, axis=1),
                               rtol=1e-5, atol=1e-5)


def test_speculative_llama_lossless():
    from onnx_rusty_inference_engine_tpu.models.llama import TINY as LT

    ids = rng.integers(0, LT.vocab_size, (2, 4)).astype(np.int64)
    ref, _ = Generator(LT, batch=2, prompt_len=4, max_len=32,
                       family="llama").generate(ids, 8)
    sg = SpeculativeGenerator(LT, batch=2, prompt_len=4, max_len=32, k=3,
                              family="llama", target_seed=0, draft_seed=0)
    toks, _ = sg.generate(ids, 8)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


def test_speculative_sampling_mode():
    """temperature > 0: rejection-sampling verification. Deterministic
    per seed, seed-sensitive, and a same-weights draft is always accepted
    (p == q => accept prob 1)."""
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)

    def run(seed):
        sg = SpeculativeGenerator(TINY, batch=2, prompt_len=4, max_len=40,
                                  k=4, target_seed=0, draft_seed=0)
        t, _ = sg.generate(ids, 10, temperature=0.8, sample_seed=seed)
        return np.asarray(t), sg.acceptance_rate

    a, acc = run(3)
    b, _ = run(3)
    np.testing.assert_array_equal(a, b)
    # identical WEIGHTS, but q comes from the chunk=1 graph and p from
    # the chunk=4 graph — different XLA programs may differ in low-order
    # bits, so near-total (not bitwise-guaranteed-total) acceptance
    assert acc >= 0.9
    c, _ = run(9)
    assert not np.array_equal(a, c)
    assert a.shape == (2, 10)
    assert a.min() >= 0 and a.max() < TINY.vocab_size


def test_speculative_sampling_mismatched_draft_valid():
    """A different draft still yields valid, per-seed-deterministic
    samples; acceptance lands strictly between 0 and 1."""
    draft = GPT2Config(n_layer=1, n_head=TINY.n_head, n_embd=TINY.n_embd,
                       vocab_size=TINY.vocab_size,
                       n_positions=TINY.n_positions)
    ids = rng.integers(0, TINY.vocab_size, (1, 4)).astype(np.int64)
    sg = SpeculativeGenerator(TINY, draft, batch=1, prompt_len=4,
                              max_len=64, k=4, target_seed=0, draft_seed=7)
    t, _ = sg.generate(ids, 20, temperature=1.0, sample_seed=1)
    t = np.asarray(t)
    assert t.shape == (1, 20)
    assert 0.0 <= sg.acceptance_rate <= 1.0
