"""chunked_prefill × multi_step: K chunk steps per dispatch, fully
device-resident (prompt suffixes in a device buffer, per-slot
prefill/decode mode flags in the scan carry). Round-4 VERDICT item 2b —
the restriction `multi_step is incompatible with chunked_prefill` is gone.
"""

import numpy as np

from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

rng = np.random.default_rng(57)


def _reference_tokens(prompt, n_new, plen, max_len):
    gen = Generator(TINY, batch=1, prompt_len=plen, max_len=max_len)
    out, _ = gen.generate(prompt[None, :], n_new)
    return [int(t) for t in out[0]]


def test_chunked_multi_greedy_matches_single_step():
    """Greedy served tokens from the K-chunk device block must equal the
    host chunked loop exactly (same graph, same argmax), across prompts
    shorter and longer than the chunk and staggered admissions."""
    kw = dict(slots=3, prompt_len=8, max_len=48, chunked_prefill=True,
              chunk=4)
    srv1 = DecodeServer(TINY, **kw)
    srvK = DecodeServer(TINY, **kw, multi_step=3)
    try:
        reqs = []
        for _ in range(6):
            plen = int(rng.integers(2, 20))
            n_new = int(rng.integers(2, 8))
            prompt = rng.integers(0, TINY.vocab_size, (plen,)).astype(
                np.int64)
            reqs.append((prompt, n_new))
        host = [srv1.submit(p, n) for p, n in reqs]
        dev = [srvK.submit(p, n) for p, n in reqs]
        for (p, n), hf, df in zip(reqs, host, dev):
            h = hf.result(timeout=300)
            d = df.result(timeout=300)
            assert d == h == _reference_tokens(p, n, p.size, 48), (
                p.size, d, h)
    finally:
        srv1.stop()
        srvK.stop()
    assert srvK.steps > 0


def test_chunked_multi_sampled_k_invariance():
    """Sampled streams are keyed on (seed, cache position): identical for
    any K at fixed chunk size."""
    p = rng.integers(0, TINY.vocab_size, (9,)).astype(np.int64)
    streams = []
    for K in (1, 2, 4):
        srv = DecodeServer(TINY, slots=2, max_len=40, chunked_prefill=True,
                           chunk=4, multi_step=K)
        try:
            streams.append(srv.submit(
                p, 8, temperature=0.8, top_p=0.9, seed=13
            ).result(timeout=300))
        finally:
            srv.stop()
    assert streams[0] == streams[1] == streams[2]
    assert len(streams[0]) == 8


def test_chunked_multi_prefix_cache():
    """Prefix-cache hits (shared system prompt) compose with the device
    block: the suffix streams through it, tokens stay exact."""
    sys_p = rng.integers(0, TINY.vocab_size, (10,)).astype(np.int64)
    tails = [rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
             for _ in range(2)]
    prompts = [np.concatenate([sys_p, t]) for t in tails]
    srv = DecodeServer(TINY, slots=2, max_len=48, chunked_prefill=True,
                       chunk=4, multi_step=2, prompt_cache=4)
    try:
        a = srv.submit(prompts[0], 5).result(timeout=300)
        b = srv.submit(prompts[1], 5).result(timeout=300)
        hits = srv.stats()["prefix_hits"]
    finally:
        srv.stop()
    assert a == _reference_tokens(prompts[0], 5, prompts[0].size, 48)
    assert b == _reference_tokens(prompts[1], 5, prompts[1].size, 48)
    assert hits >= 1


def test_chunked_multi_int8_kv_calibration_handoff():
    """int8 KV: the shadow-fp32 calibration phase runs the host loop;
    once scales exist the device block takes over. Tokens must equal the
    single-step chunked int8 server exactly (same graphs, same argmax)."""
    kw = dict(slots=2, prompt_len=8, max_len=32, chunked_prefill=True,
              chunk=4, kv_dtype="int8")
    srv1 = DecodeServer(TINY, **kw)
    srvK = DecodeServer(TINY, **kw, multi_step=2)
    try:
        prompts = [rng.integers(0, TINY.vocab_size, (int(p),)).astype(
            np.int64) for p in (6, 11)]
        host = [f.result(timeout=300)
                for f in [srv1.submit(p, 6) for p in prompts]]
        dev = [f.result(timeout=300)
               for f in [srvK.submit(p, 6) for p in prompts]]
    finally:
        srv1.stop()
        srvK.stop()
    assert dev == host


def test_seq2seq_multi_step_matches_single_step():
    """Seq2SeqServer(multi_step=K): greedy served tokens equal the
    single-step host loop exactly, for t5 AND asr families."""
    from onnx_rusty_inference_engine_tpu.serve_llm import Seq2SeqServer
    from onnx_rusty_inference_engine_tpu.models.t5 import TINY as T5_TINY

    srv1 = Seq2SeqServer(T5_TINY, slots=2, src_len=8, max_len=16)
    srvK = Seq2SeqServer(T5_TINY, slots=2, src_len=8, max_len=16,
                         multi_step=3)
    try:
        srcs = [rng.integers(1, T5_TINY.vocab_size, (int(n),)).astype(
            np.int64) for n in (3, 6)]
        host = [f.result(timeout=300)
                for f in [srv1.submit(s, 6) for s in srcs]]
        dev = [f.result(timeout=300)
               for f in [srvK.submit(s, 6) for s in srcs]]
    finally:
        srv1.stop()
        srvK.stop()
    assert dev == host


def test_seq2seq_multi_step_sampled_k_invariance():
    from onnx_rusty_inference_engine_tpu.serve_llm import Seq2SeqServer
    from onnx_rusty_inference_engine_tpu.models.t5 import TINY as T5_TINY

    src = rng.integers(1, T5_TINY.vocab_size, (5,)).astype(np.int64)
    streams = []
    for K in (1, 3):
        srv = Seq2SeqServer(T5_TINY, slots=2, src_len=8, max_len=16,
                            multi_step=K)
        try:
            streams.append(srv.submit(
                src, 6, temperature=0.9, top_k=30, seed=21
            ).result(timeout=300))
        finally:
            srv.stop()
    assert streams[0] == streams[1]
    assert len(streams[0]) == 6


def test_seq2seq_multi_step_asr_family():
    from onnx_rusty_inference_engine_tpu.models.asr import TINY as ASR_TINY
    from onnx_rusty_inference_engine_tpu.serve_llm import Seq2SeqServer

    srv1 = Seq2SeqServer(ASR_TINY, slots=2, src_len=64, max_len=16,
                         family="asr")
    srvK = Seq2SeqServer(ASR_TINY, slots=2, src_len=64, max_len=16,
                         family="asr", multi_step=2)
    try:
        wave = rng.standard_normal(48).astype(np.float32)
        host = srv1.submit(wave, 5).result(timeout=300)
        dev = srvK.submit(wave, 5).result(timeout=300)
    finally:
        srv1.stop()
        srvK.stop()
    assert dev == host


def test_chunked_multi_parked_lane_cache_stays_finite():
    """Regression (r4 chip bench, same family as the spec-server NaN):
    a lane parked at pos = max_len - 1 during a chunked multi dispatch
    fed a C-token window whose tail positions fell past the position
    tables; the OOB embedding rows were scatter-matmuled into the parked
    slot's kv rows, corrupting the NEXT request admitted there. Needs
    max_len == n_positions, warm traffic leaving lanes parked, then a
    full batch over the previously-parked lanes."""
    assert TINY.n_positions == 64
    kw = dict(slots=3, prompt_len=8, max_len=64, chunked_prefill=True,
              chunk=4)
    srv = DecodeServer(TINY, **kw, multi_step=3)
    try:
        p0 = rng.integers(0, TINY.vocab_size, (6,)).astype(np.int64)
        srv.submit(p0, 5).result(timeout=300)   # 2 lanes stay parked
        reqs = [rng.integers(0, TINY.vocab_size,
                             (int(rng.integers(3, 12)),)).astype(np.int64)
                for _ in range(3)]
        futs = [srv.submit(p, 10) for p in reqs]
        got = [f.result(timeout=300) for f in futs]
    finally:
        srv.stop()
    want = [_reference_tokens(p, 10, p.size, 64) for p in reqs]
    assert got == want
