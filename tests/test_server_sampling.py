"""Per-request sampling in the continuous-batching server.

Each request carries (temperature, top_k, top_p, seed); selection happens
host-side from the returned logits with a per-request PRNG, so concurrent
slots draw independent, reproducible streams while greedy requests in the
same batch stay EXACTLY the isolated generation."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

rng = np.random.default_rng(31)


def _prompt(n=5):
    return rng.integers(0, TINY.vocab_size, (n,)).astype(np.int64)


def test_sampled_request_is_seed_deterministic():
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24)
    try:
        p = _prompt()
        a = srv.submit(p, 8, temperature=1.0, seed=7).result(timeout=300)
        b = srv.submit(p, 8, temperature=1.0, seed=7).result(timeout=300)
        c = srv.submit(p, 8, temperature=1.0, seed=8).result(timeout=300)
        d = srv.submit(p, 8, temperature=5.0, seed=9).result(timeout=300)
    finally:
        srv.stop()
    assert a == b                      # same seed -> same stream
    assert (a != c) or (a != d)        # different seeds/temps diverge


def test_top_k_one_is_greedy():
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24)
    try:
        p = _prompt()
        greedy = srv.submit(p, 6).result(timeout=300)
        tk1 = srv.submit(p, 6, temperature=1.7, top_k=1,
                         seed=3).result(timeout=300)
    finally:
        srv.stop()
    assert tk1 == greedy


def test_mixed_greedy_and_sampled_batch():
    """A sampled request in the next slot must not perturb the greedy
    one: greedy still equals isolated generation exactly."""
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24)
    try:
        pg, ps = _prompt(), _prompt()
        fg = srv.submit(pg, 6)
        fs = srv.submit(ps, 6, temperature=2.0, top_p=0.9, seed=5)
        greedy = fg.result(timeout=300)
        sampled = fs.result(timeout=300)
    finally:
        srv.stop()
    gen = Generator(TINY, batch=1, prompt_len=pg.size, max_len=24)
    want, _ = gen.generate(pg[None], 6)
    assert greedy == list(want[0])
    assert len(sampled) == 6
    assert all(0 <= t < TINY.vocab_size for t in sampled)


def test_sampled_with_prompt_cache_hit():
    """An exact-prompt cache hit replays KV + cached logits; a sampled
    request draws its own first token from them (greedy replay stays
    bit-identical)."""
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24,
                       prompt_cache=4)
    try:
        p = _prompt()
        cold = srv.submit(p, 5).result(timeout=300)
        warm_greedy = srv.submit(p, 5).result(timeout=300)
        warm_tk1 = srv.submit(p, 5, temperature=1.0, top_k=1,
                              seed=2).result(timeout=300)
    finally:
        srv.stop()
    assert warm_greedy == cold
    assert warm_tk1 == cold            # top_k=1 == greedy, even on a hit
    assert srv.prefix_hits == 2


def test_chunked_prefill_sampling():
    srv = DecodeServer(TINY, slots=2, max_len=32, chunked_prefill=True,
                       chunk=4)
    try:
        p = _prompt(9)
        a = srv.submit(p, 6, temperature=1.0, seed=4).result(timeout=300)
        b = srv.submit(p, 6, temperature=1.0, seed=4).result(timeout=300)
    finally:
        srv.stop()
    assert a == b
    assert len(a) == 6


def test_multi_step_sampled_k_invariance():
    """On-device sampling in multi_step keys each draw on (request seed,
    cache position), so a request's stream is identical for ANY K — the
    strong form of served == isolated for the device loop."""
    p = _prompt()
    streams = []
    for K in (1, 2, 4):
        srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=32,
                           multi_step=K)
        try:
            streams.append(srv.submit(
                p, 8, temperature=0.9, top_p=0.9, seed=11
            ).result(timeout=300))
        finally:
            srv.stop()
    assert streams[0] == streams[1] == streams[2]
    assert len(streams[0]) == 8


def test_multi_step_sampled_independent_of_cotenants():
    """A sampled request's stream must not depend on what shares the
    batch (per-slot keys, not a batch-wide key chain)."""
    p = _prompt()
    kw = dict(temperature=1.1, top_k=20, seed=5)
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=32,
                       multi_step=2)
    try:
        alone = srv.submit(p, 8, **kw).result(timeout=300)
        busy_f = srv.submit(_prompt(), 8, temperature=2.0, seed=99)
        again = srv.submit(p, 8, **kw).result(timeout=300)
        busy_f.result(timeout=300)
    finally:
        srv.stop()
    assert alone == again


def test_multi_step_topk1_matches_host_greedy():
    """top_k=1 collapses sampling to argmax in BOTH samplers, so the
    device multi_step stream must equal the single-step host stream
    exactly."""
    p = _prompt()
    srv1 = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24)
    srvK = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24,
                        multi_step=3)
    try:
        host = srv1.submit(p, 6, temperature=1.7, top_k=1,
                           seed=3).result(timeout=300)
        dev = srvK.submit(p, 6, temperature=1.7, top_k=1,
                          seed=3).result(timeout=300)
    finally:
        srv1.stop()
        srvK.stop()
    assert dev == host


def test_multi_step_logit_bias_matches_host():
    """Greedy + logit_bias is deterministic: device multi_step must equal
    the single-step host path token for token (bias forces a token)."""
    p = _prompt()
    forced = 7
    bias = {forced: 1000.0}
    srv1 = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24)
    srvK = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24,
                        multi_step=2)
    try:
        host = srv1.submit(p, 5, logit_bias=bias).result(timeout=300)
        dev = srvK.submit(p, 5, logit_bias=bias).result(timeout=300)
    finally:
        srv1.stop()
        srvK.stop()
    assert dev == host == [forced] * 5


def test_seq2seq_server_sampling():
    """Seq2SeqServer (t5) takes the same sampling knobs: seeded streams
    reproduce, top_k=1 reduces to greedy."""
    from onnx_rusty_inference_engine_tpu.models.t5 import TINY as T5_TINY
    from onnx_rusty_inference_engine_tpu.serve_llm import Seq2SeqServer

    srv = Seq2SeqServer(T5_TINY, slots=2, src_len=8, max_len=16)
    try:
        src = [3, 5, 7]
        greedy = srv.submit(np.asarray(src), 4).result(timeout=300)
        tk1 = srv.submit(np.asarray(src), 4, temperature=1.5, top_k=1,
                         seed=2).result(timeout=300)
        s1 = srv.submit(np.asarray(src), 4, temperature=1.0,
                        seed=6).result(timeout=300)
        s2 = srv.submit(np.asarray(src), 4, temperature=1.0,
                        seed=6).result(timeout=300)
    finally:
        srv.stop()
    assert tk1 == greedy
    assert s1 == s2


def test_logit_bias_bans_and_forces_tokens():
    """OpenAI-style logit_bias: a huge negative bias bans a token (the
    greedy winner shifts to runner-up); a huge positive bias forces one."""
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24)
    try:
        p = _prompt()
        greedy = srv.submit(p, 4).result(timeout=300)
        banned = srv.submit(p, 4, logit_bias={greedy[0]: -1e9}
                            ).result(timeout=300)
        forced = srv.submit(p, 3, logit_bias={7: 1e9}).result(timeout=300)
    finally:
        srv.stop()
    assert banned[0] != greedy[0]
    assert forced == [7, 7, 7]


def test_logit_bias_with_sampling_deterministic():
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24)
    try:
        p = _prompt()
        a = srv.submit(p, 5, temperature=1.0, seed=3,
                       logit_bias={0: -1e9}).result(timeout=300)
        b = srv.submit(p, 5, temperature=1.0, seed=3,
                       logit_bias={0: -1e9}).result(timeout=300)
    finally:
        srv.stop()
    assert a == b
    assert 0 not in a


def test_seq2seq_encoder_cache():
    """Repeated sources skip the encoder: cross-K/V replay from the LRU,
    served tokens identical to the cold admission."""
    from onnx_rusty_inference_engine_tpu.models.t5 import TINY as T5_TINY
    from onnx_rusty_inference_engine_tpu.serve_llm import Seq2SeqServer

    srv = Seq2SeqServer(T5_TINY, slots=2, src_len=8, max_len=16,
                        encoder_cache=4)
    try:
        src = np.asarray([3, 5, 7])
        cold = srv.submit(src, 4).result(timeout=300)
        warm = srv.submit(src, 4).result(timeout=300)
        other = srv.submit(np.asarray([9, 2]), 4).result(timeout=300)
    finally:
        srv.stop()
    assert warm == cold
    assert len(other) == 4
    st = srv.stats()
    assert st["encoder_cache_hits"] == 1


def test_frequency_penalty_prevents_repetition():
    """A huge frequency penalty makes every generated token distinct
    (each emission bans itself) — applied at temperature 0 too."""
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24)
    try:
        p = _prompt()
        plain = srv.submit(p, 6).result(timeout=300)
        pen = srv.submit(p, 6, frequency_penalty=1e9).result(timeout=300)
    finally:
        srv.stop()
    assert len(set(pen)) == len(pen)          # all distinct
    assert pen[0] == plain[0]                 # first token unaffected


def test_min_p_one_is_greedy():
    """min_p=1.0 keeps only tokens tied with the max prob: greedy."""
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24)
    try:
        p = _prompt()
        greedy = srv.submit(p, 5).result(timeout=300)
        mp = srv.submit(p, 5, temperature=1.3, min_p=1.0,
                        seed=4).result(timeout=300)
        s1 = srv.submit(p, 5, temperature=1.0, min_p=0.05,
                        seed=6).result(timeout=300)
        s2 = srv.submit(p, 5, temperature=1.0, min_p=0.05,
                        seed=6).result(timeout=300)
    finally:
        srv.stop()
    assert mp == greedy
    assert s1 == s2                           # seed-deterministic


def test_multi_step_penalties_match_host():
    """Greedy + frequency/presence penalties is deterministic: the
    on-device counts-histogram penalty must reproduce the host stream
    exactly (including the admission token in the counts)."""
    p = _prompt()
    kw = dict(frequency_penalty=1.5, presence_penalty=2.0)
    srv1 = DecodeServer(TINY, slots=2, prompt_len=8, max_len=32)
    srvK = DecodeServer(TINY, slots=2, prompt_len=8, max_len=32,
                        multi_step=2)
    try:
        host = srv1.submit(p, 10, **kw).result(timeout=300)
        dev = srvK.submit(p, 10, **kw).result(timeout=300)
    finally:
        srv1.stop()
        srvK.stop()
    assert dev == host


def test_multi_step_top_p_zero_matches_host():
    """top_p=0.0 keeps only the top-1 token in the host sampler; the
    device path must fall back the same way (not mask every token to
    -inf and emit token 0)."""
    p = _prompt()
    srv1 = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24)
    srvK = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24,
                        multi_step=2)
    try:
        host = srv1.submit(p, 6, temperature=1.3,
                           top_p=0.0).result(timeout=300)
        dev = srvK.submit(p, 6, temperature=1.3,
                          top_p=0.0).result(timeout=300)
        greedy = srv1.submit(p, 6).result(timeout=300)
    finally:
        srv1.stop()
        srvK.stop()
    assert dev == host == greedy
