"""Device-resident multi-token generation (Generator(device_loop=K)):
K decode steps run inside ONE dispatch (lax.scan over time, on-device
selection + KV update). Must be LOSSLESS vs the classic one-step-per-call
host loop in every mode."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY

rng = np.random.default_rng(5)


def _prompts(B, P, vocab):
    return rng.integers(0, vocab, (B, P)).astype(np.int64)


def _pair(device_loop, **kw):
    base = dict(batch=2, prompt_len=4, max_len=32)
    base.update(kw)
    host = Generator(TINY, **base)
    dev = Generator(TINY, device_loop=device_loop, **base)
    return host, dev


def test_greedy_parity():
    host, dev = _pair(4)
    ids = _prompts(2, 4, TINY.vocab_size)
    ref, _ = host.generate(ids, 11)       # 11 = non-multiple of K=4
    got, _ = dev.generate(ids, 11)
    np.testing.assert_array_equal(got, ref)


def test_greedy_parity_k1_and_k8():
    ids = _prompts(2, 4, TINY.vocab_size)
    host, dev1 = _pair(1)
    ref, _ = host.generate(ids, 6)
    got1, _ = dev1.generate(ids, 6)
    np.testing.assert_array_equal(got1, ref)
    _, dev8 = _pair(8)
    got8, _ = dev8.generate(ids, 6)       # n_new-1 < K: one truncated block
    np.testing.assert_array_equal(got8, ref)


def test_sampling_parity_same_key_stream():
    """The device loop splits the PRNG key in the same order as the host
    loop, so sampled output is bit-identical, not just same-distribution."""
    host, dev = _pair(3)
    ids = _prompts(2, 4, TINY.vocab_size)
    ref, _ = host.generate(ids, 9, temperature=0.8, top_k=20, sample_seed=7)
    got, _ = dev.generate(ids, 9, temperature=0.8, top_k=20, sample_seed=7)
    np.testing.assert_array_equal(got, ref)


def test_int8_kv_parity():
    host, dev = _pair(4, kv_dtype="int8")
    ids = _prompts(2, 4, TINY.vocab_size)
    ref, _ = host.generate(ids, 10)
    got, _ = dev.generate(ids, 10)
    np.testing.assert_array_equal(got, ref)


def test_eos_freeze_parity():
    host, dev = _pair(4)
    ids = _prompts(2, 4, TINY.vocab_size)
    ref, _ = host.generate(ids, 12)
    eos = int(ref[0, 2])                  # force an early stop on row 0
    r_eos, _ = host.generate(ids, 12, eos_id=eos)
    g_eos, _ = dev.generate(ids, 12, eos_id=eos)
    np.testing.assert_array_equal(g_eos, r_eos)


def test_repetition_penalty_parity():
    host, dev = _pair(4)
    ids = _prompts(2, 4, TINY.vocab_size)
    ref, _ = host.generate(ids, 8, repetition_penalty=1.4)
    got, _ = dev.generate(ids, 8, repetition_penalty=1.4)
    np.testing.assert_array_equal(got, ref)


def test_llama_family_device_loop():
    from onnx_rusty_inference_engine_tpu.models.llama import TINY as LTINY

    base = dict(batch=2, prompt_len=4, max_len=24, family="llama",
                kv_dtype="int8")
    host = Generator(LTINY, **base)
    dev = Generator(LTINY, device_loop=5, **base)
    ids = _prompts(2, 4, LTINY.vocab_size)
    ref, _ = host.generate(ids, 9)
    got, _ = dev.generate(ids, 9)
    np.testing.assert_array_equal(got, ref)


def test_return_logits_falls_back_to_host_loop():
    _, dev = _pair(4)
    ids = _prompts(2, 4, TINY.vocab_size)
    toks, logits = dev.generate(ids, 5, return_logits=True)
    assert len(logits) == 5
    assert toks.shape == (2, 5)


def test_min_p_generator_parity_and_greedy_limit():
    """min_p on the on-device sampler: min_p=1.0 collapses to greedy;
    device_loop parity holds with min_p active."""
    import numpy as np

    from onnx_rusty_inference_engine_tpu.generate import Generator
    from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY

    rng = np.random.default_rng(3)
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)
    kw = dict(batch=2, prompt_len=4, max_len=16)
    greedy, _ = Generator(TINY, **kw).generate(ids, 6)
    mp, _ = Generator(TINY, **kw).generate(ids, 6, temperature=1.5,
                                           min_p=1.0, sample_seed=2)
    np.testing.assert_array_equal(mp, greedy)

    want, _ = Generator(TINY, **kw).generate(ids, 8, temperature=1.0,
                                             min_p=0.1, sample_seed=5)
    got, _ = Generator(TINY, device_loop=4, **kw).generate(
        ids, 8, temperature=1.0, min_p=0.1, sample_seed=5)
    np.testing.assert_array_equal(got, want)
