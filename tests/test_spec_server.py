"""Speculative decoding in the continuous-batching server
(serve_llm.SpeculativeServer): one speculation round per server step over
the whole slot pool; greedy verification is LOSSLESS, so served tokens
must EXACTLY match the target model's isolated greedy generation."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
from onnx_rusty_inference_engine_tpu.serve_llm import SpeculativeServer

import dataclasses

rng = np.random.default_rng(61)
DRAFT = dataclasses.replace(TINY, n_layer=1)


def _reference(prompt, n_new, max_len):
    gen = Generator(TINY, batch=1, prompt_len=prompt.size, max_len=max_len)
    return [int(t) for t in gen.generate(prompt[None], n_new)[0][0]]


def test_spec_server_matches_isolated_generation():
    """Staggered requests over fewer slots: every sequence equals the
    target's own greedy decode token-for-token (losslessness survives
    continuous batching and slot reuse)."""
    srv = SpeculativeServer(TINY, DRAFT, slots=2, prompt_len=8,
                            max_len=48, k=4, draft_seed=1)
    try:
        reqs = []
        for i in range(5):
            plen = int(rng.integers(2, 9))
            n_new = int(rng.integers(3, 9))
            p = rng.integers(0, TINY.vocab_size, (plen,)).astype(np.int64)
            reqs.append((p, n_new, srv.submit(p, n_new)))
        for p, n_new, fut in reqs:
            got = fut.result(timeout=300)
            want = _reference(p, n_new, 48)
            assert got == want, (p, got, want)
        st = srv.stats()
    finally:
        srv.stop()
    assert 0.0 <= st["acceptance_rate"] <= 1.0
    assert st["requests"] == 5


def test_spec_server_draft_is_target_accepts_everything():
    """With draft == target (same seed), every proposal verifies: the
    acceptance rate is 1.0 and dispatch count collapses."""
    srv = SpeculativeServer(TINY, TINY, slots=2, prompt_len=6,
                            max_len=48, k=4, draft_seed=0)
    try:
        p = rng.integers(0, TINY.vocab_size, (5,)).astype(np.int64)
        got = srv.submit(p, 9).result(timeout=300)
        st = srv.stats()
    finally:
        srv.stop()
    assert got == _reference(p, 9, 48)
    assert st["acceptance_rate"] == 1.0


def test_spec_server_eos_and_stop():
    srv = SpeculativeServer(TINY, DRAFT, slots=2, prompt_len=6,
                            max_len=48, k=3)
    try:
        p = rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
        ref = _reference(p, 8, 48)
        eos = ref[2]
        got = srv.submit(p, 8, eos_id=eos).result(timeout=300)
    finally:
        srv.stop()
    want = ref[: ref.index(eos) + 1] if eos in ref else ref
    assert got == want


def test_spec_server_rejects_filtering():
    """temperature is supported (rejection sampling); top_k/top_p/
    logit_bias/adapter are not — they break the verification identity."""
    srv = SpeculativeServer(TINY, DRAFT, slots=2, prompt_len=6,
                            max_len=48)
    try:
        for bad in ({"top_p": 0.9}, {"logit_bias": {1: -1e9}},
                    {"adapter": 1}):
            with pytest.raises(ValueError, match="DecodeServer"):
                srv.submit(np.array([1, 2, 3]), 4, **bad)
    finally:
        srv.stop()


def test_spec_server_streams_tokens():
    srv = SpeculativeServer(TINY, DRAFT, slots=2, prompt_len=6,
                            max_len=48, k=3)
    try:
        p = rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
        seen = []
        got = srv.submit(p, 6, on_token=seen.append).result(timeout=300)
    finally:
        srv.stop()
    assert seen == got == _reference(p, 6, 48)


def test_spec_server_sampled_rejection():
    """temperature > 0 per slot: speculative rejection sampling —
    deterministic per seed, co-batched greedy slots unaffected, and
    draft == target accepts every proposal (q == p => prob 1)."""
    srv = SpeculativeServer(TINY, DRAFT, slots=2, prompt_len=6,
                            max_len=48, k=3)
    try:
        pg = rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
        ps = rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
        fg = srv.submit(pg, 6)
        fs = srv.submit(ps, 6, temperature=1.0, seed=9)
        greedy, s1 = fg.result(timeout=300), fs.result(timeout=300)
        s2 = srv.submit(ps, 6, temperature=1.0, seed=9).result(timeout=300)
    finally:
        srv.stop()
    assert greedy == _reference(pg, 6, 48)   # greedy slot stays lossless
    assert len(s1) == 6 and all(0 <= t < TINY.vocab_size for t in s1)
    # NOTE: s1 vs s2 ran in different co-batch states; per-slot math is
    # independent of co-slots, so the stream must reproduce
    assert s1 == s2

    srv2 = SpeculativeServer(TINY, TINY, slots=2, prompt_len=6,
                             max_len=48, k=3, draft_seed=0)
    try:
        out = srv2.submit(ps, 8, temperature=0.7, seed=3).result(
            timeout=300)
        st = srv2.stats()
    finally:
        srv2.stop()
    assert len(out) == 8
    assert st["acceptance_rate"] == 1.0      # q == p: always accepted


def test_spec_server_still_rejects_topk():
    srv = SpeculativeServer(TINY, DRAFT, slots=2, prompt_len=6,
                            max_len=48)
    try:
        with pytest.raises(ValueError, match="DecodeServer"):
            srv.submit(np.array([1, 2, 3]), 4, top_k=5)
    finally:
        srv.stop()


def test_ngram_prompt_lookup_matches_isolated():
    """Draft-FREE speculation (ngram=2 prompt lookup): zero draft
    dispatches per round, still exactly the target's greedy decode —
    including slot reuse and a repetitive prompt that actually hits."""
    srv = SpeculativeServer(TINY, slots=2, prompt_len=8, max_len=48,
                            k=4, ngram=2)
    assert srv.d_decode is None              # really no draft engines
    try:
        reqs = []
        rep = np.array([7, 3, 7, 3, 7, 3], np.int64)  # repetitive
        reqs.append((rep, 6, srv.submit(rep, 6)))
        for _ in range(3):
            p = rng.integers(0, TINY.vocab_size, (5,)).astype(np.int64)
            reqs.append((p, 5, srv.submit(p, 5)))
        for p, n_new, fut in reqs:
            got = fut.result(timeout=300)
            assert got == _reference(p, n_new, 48), (p, got)
        st = srv.stats()
    finally:
        srv.stop()
    assert st["requests"] == 4
    assert 0.0 <= st["acceptance_rate"] <= 1.0


def test_ngram_rejects_temperature():
    srv = SpeculativeServer(TINY, slots=2, prompt_len=6, max_len=48,
                            ngram=2)
    try:
        with pytest.raises(ValueError, match="greedy only"):
            srv.submit(np.array([1, 2, 3]), 4, temperature=1.0)
    finally:
        srv.stop()


def test_ngram_multi_step_matches_single_step():
    """SpeculativeServer(ngram, multi_step=R): R whole speculation rounds
    per dispatch with DEVICE-computed prompt-lookup proposals; served
    tokens must equal the single-step ngram server (and therefore the
    target's isolated greedy decode)."""
    motif = np.array([5, 9, 2], np.int64)
    prompts = [np.tile(motif, 3)[:7],
               rng.integers(0, TINY.vocab_size, (6,)).astype(np.int64)]
    kw = dict(slots=2, prompt_len=8, max_len=64, k=4, ngram=2)
    srv1 = SpeculativeServer(TINY, **kw)
    srvR = SpeculativeServer(TINY, **kw, multi_step=3)
    try:
        host = [srv1.submit(p, 12).result(timeout=300) for p in prompts]
        dev = [srvR.submit(p, 12).result(timeout=300) for p in prompts]
        acc = srvR.stats()["acceptance_rate"]
    finally:
        srv1.stop()
        srvR.stop()
    assert dev == host
    assert 0.0 <= acc <= 1.0


def _prompt(n=6):
    return rng.integers(0, TINY.vocab_size, (n,)).astype(np.int64)


def test_ngram_multi_step_rejects_sampling():
    # (draft-model multi_step is now a supported mode — see the
    # test_draft_multi_step_* family; only ngram stays greedy-only)
    with pytest.raises(ValueError, match="greedy only"):
        srv = SpeculativeServer(TINY, slots=2, prompt_len=8, max_len=64,
                                k=3, ngram=2, multi_step=2)
        try:
            srv.submit(_prompt(), 4, temperature=1.0)
        finally:
            srv.stop()


def test_ngram_multi_step_eos_and_slot_reuse():
    """eos mid-block discards overshoot; the slot serves the next request
    exactly."""
    kw = dict(slots=1, prompt_len=8, max_len=64, k=3, ngram=2)
    srv1 = SpeculativeServer(TINY, **kw)
    srvR = SpeculativeServer(TINY, **kw, multi_step=2)
    try:
        p = _prompt(6)
        base = srv1.submit(p, 10).result(timeout=300)
        eos = base[3]
        a = srv1.submit(p, 10, eos_id=eos).result(timeout=300)
        b = srvR.submit(p, 10, eos_id=eos).result(timeout=300)
        p5 = _prompt(5)
        c = srvR.submit(p5, 6).result(timeout=300)
        d = srv1.submit(p5, 6).result(timeout=300)
    finally:
        srv1.stop()
        srvR.stop()
    assert b == a
    assert c == d


def test_ngram_multi_step_parked_lane_cache_stays_finite():
    """Regression (found by the r4 chip bench): lanes PARKED at
    pos = max_len - k during a multi-round dispatch advanced pos in the
    scan carry; round >= 2 walked the verify window past the position
    tables, and the OOB position-embedding rows (JAX fill-mode NaN at
    the time) were scatter-MATMULed into the parked slot's kv cache
    (0 * NaN = NaN), silently breaking the NEXT request admitted to that
    slot. Needs max_len == n_positions so OOB is reachable, warm traffic
    that leaves most lanes parked across a dispatch, then a full batch."""
    assert TINY.n_positions == 64
    kw = dict(slots=4, prompt_len=8, max_len=64, k=4, ngram=2)
    srv = SpeculativeServer(TINY, **kw, multi_step=3)
    try:
        # warm: 1 request, 3 lanes parked through its multi dispatches
        p0 = _prompt(8)
        srv.submit(p0, 6).result(timeout=300)
        # full batch lands on the previously-parked lanes
        prompts = [_prompt(8) for _ in range(4)]
        futs = [srv.submit(p, 12) for p in prompts]
        got = [f.result(timeout=300) for f in futs]
    finally:
        srv.stop()
    want = [_reference(p, 12, 64) for p in prompts]
    assert got == want


# ---------------------------------------------------------------------------
# device-resident DRAFT-MODEL rounds (multi_step=R without ngram)
# ---------------------------------------------------------------------------
def test_draft_multi_step_matches_isolated_greedy():
    """R draft-model speculation rounds per dispatch: greedy verification
    stays LOSSLESS — served tokens equal the target's isolated greedy
    decode exactly, with staggered slot reuse."""
    srv = SpeculativeServer(TINY, DRAFT, slots=2, prompt_len=8,
                            max_len=48, k=3, draft_seed=1, multi_step=3)
    try:
        reqs = []
        for i in range(5):
            plen = int(rng.integers(2, 9))
            n_new = int(rng.integers(3, 9))
            p = rng.integers(0, TINY.vocab_size, (plen,)).astype(np.int64)
            reqs.append((p, n_new, srv.submit(p, n_new)))
        for p, n_new, fut in reqs:
            got = fut.result(timeout=300)
            want = _reference(p, n_new, 48)
            assert got == want, (p, got, want)
        st = srv.stats()
    finally:
        srv.stop()
    assert st["requests"] == 5
    assert 0.0 <= st["acceptance_rate"] <= 1.0


def test_draft_multi_step_matches_host_rounds_greedy():
    """The device-resident rounds must emit exactly what the host-loop
    path emits (same target/draft/k): the scan is a pure batching of the
    same math."""
    prompts = [rng.integers(0, TINY.vocab_size, (int(rng.integers(2, 7)),)
                            ).astype(np.int64) for _ in range(3)]
    outs = []
    for ms in (0, 2):
        srv = SpeculativeServer(TINY, DRAFT, slots=2, prompt_len=8,
                                max_len=48, k=3, draft_seed=1,
                                multi_step=ms)
        try:
            futs = [srv.submit(p, 7) for p in prompts]
            outs.append([f.result(timeout=300) for f in futs])
        finally:
            srv.stop()
    assert outs[0] == outs[1]


def test_draft_multi_step_sampled_rejection():
    """Device rejection sampling: reproducible per (seed, prompt),
    greedy co-slots stay lossless, q == p accepts (nearly) everything."""
    srv = SpeculativeServer(TINY, DRAFT, slots=2, prompt_len=6,
                            max_len=48, k=3, multi_step=2)
    try:
        pg = rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
        ps = rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
        fg = srv.submit(pg, 6)
        fs = srv.submit(ps, 6, temperature=1.0, seed=9)
        greedy, s1 = fg.result(timeout=300), fs.result(timeout=300)
        s2 = srv.submit(ps, 6, temperature=1.0, seed=9).result(timeout=300)
    finally:
        srv.stop()
    assert greedy == _reference(pg, 6, 48)   # greedy slot stays lossless
    assert len(s1) == 6 and all(0 <= t < TINY.vocab_size for t in s1)
    # per-slot draws key on (seed, position): the stream reproduces
    # whatever the co-batch state was
    assert s1 == s2

    srv2 = SpeculativeServer(TINY, TINY, slots=2, prompt_len=6,
                             max_len=48, k=3, draft_seed=0, multi_step=2)
    try:
        out = srv2.submit(ps, 12, temperature=0.7, seed=3).result(
            timeout=300)
        st = srv2.stats()
    finally:
        srv2.stop()
    assert len(out) == 12
    # q == p: acceptance prob is 1 up to chunk-vs-step float noise
    assert st["acceptance_rate"] >= 0.9, st["acceptance_rate"]


def test_draft_multi_step_sampled_distribution():
    """Distributional losslessness of the device rejection sampler: the
    first sampled token's empirical distribution over many seeds tracks
    plain target sampling at the same temperature (Leviathan identity)."""
    import dataclasses as dc

    cfg = dc.replace(TINY, vocab_size=32)
    dcfg = dc.replace(cfg, n_layer=1)
    p = rng.integers(0, cfg.vocab_size, (4,)).astype(np.int64)
    n_seeds = 60
    srv = SpeculativeServer(cfg, dcfg, slots=4, prompt_len=6, max_len=32,
                            k=3, multi_step=2)
    try:
        futs = [srv.submit(p, 2, temperature=1.0, seed=s)
                for s in range(n_seeds)]
        # token index 1: the first token produced by the DEVICE sampler
        # (index 0 comes from host _select_token at admission)
        spec_first = [f.result(timeout=600)[1] for f in futs]
    finally:
        srv.stop()
    gen = Generator(cfg, batch=1, prompt_len=4, max_len=32)
    ref_first = []
    for s in range(n_seeds):
        toks, _ = gen.generate(p[None], 2, temperature=1.0,
                               sample_seed=s)
        ref_first.append(int(toks[0][1]))
    # coarse two-sample check: the two empirical distributions share
    # most mass (V=32, n=60 -> allow generous slack)
    import collections

    cs = collections.Counter(spec_first)
    cr = collections.Counter(ref_first)
    l1 = sum(abs(cs[t] - cr[t]) for t in set(cs) | set(cr)) / n_seeds
    assert l1 < 0.8, (l1, cs, cr)


def test_draft_multi_step_eos_and_slot_reuse():
    """EOS mid-scan finishes the request (overshoot discarded) and the
    freed slot serves the next prompt losslessly."""
    for _ in range(20):  # need an eos whose FIRST occurrence is index 3
        p1 = rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
        ref = _reference(p1, 8, 48)
        if ref[3] not in ref[:3]:
            break
    else:
        pytest.skip("no prompt with a distinct 4th greedy token")
    eos = ref[3]
    srv = SpeculativeServer(TINY, DRAFT, slots=1, prompt_len=8,
                            max_len=48, k=3, draft_seed=1, multi_step=3)
    try:
        got = srv.submit(p1, 8, eos_id=eos).result(timeout=300)
        assert got == ref[:4]
        p2 = rng.integers(0, TINY.vocab_size, (5,)).astype(np.int64)
        got2 = srv.submit(p2, 6).result(timeout=300)
        assert got2 == _reference(p2, 6, 48)
    finally:
        srv.stop()
