"""Beam search (generate.BeamGenerator): beams are batch rows of ONE
compiled decode program; cache reorder is a batch-dim take on device.

Ground truth is an independent cache-free implementation: every candidate
prefix re-scored by a FULL forward pass (no KV cache, no reordering), so
agreement proves the cache tiling + beam-reorder machinery exact."""

import numpy as np

import jax

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.generate import BeamGenerator, Generator
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY, build_gpt2

rng = np.random.default_rng(23)
_engines = {}


def _next_logprobs(prefix):
    """[V] log-probs of the next token after `prefix`, via a full
    forward at seq_len=len(prefix) — no cache involved."""
    L = len(prefix)
    if L not in _engines:
        _engines[L] = Engine(import_model(
            build_gpt2(TINY, batch=1, seq_len=L, with_presents=False)))
    out = _engines[L]({"input_ids": np.asarray(prefix, np.int64)[None]})
    return np.asarray(jax.nn.log_softmax(out["logits"][0, -1]))


def _reference_beam(prompt, n_new, K):
    lp = _next_logprobs(list(prompt))
    top = np.argsort(lp)[::-1][:K]
    beams = [(list(prompt) + [int(t)], float(lp[t])) for t in top]
    for _ in range(1, n_new):
        cands = []
        for seq, sc in beams:
            lp = _next_logprobs(seq)
            order = np.argsort(lp)[::-1][:K]  # top-K per beam suffices
            cands.extend((seq + [int(t)], sc + float(lp[t]))
                         for t in order)
        cands.sort(key=lambda x: -x[1])
        beams = cands[:K]
    best_seq, best_score = beams[0]
    return best_seq[len(prompt):], best_score


def test_beam_one_is_greedy():
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)
    want, _ = Generator(TINY, batch=2, prompt_len=4,
                        max_len=16).generate(ids, 6)
    bg = BeamGenerator(TINY, batch=2, beam=1, prompt_len=4, max_len=16)
    got, _ = bg.generate(ids, 6)
    np.testing.assert_array_equal(got, want)


def test_beam_matches_cachefree_reference():
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)
    K, n_new = 3, 4
    bg = BeamGenerator(TINY, batch=2, beam=K, prompt_len=4, max_len=16)
    got, scores = bg.generate(ids, n_new)
    for b in range(2):
        want_toks, want_score = _reference_beam(list(ids[b]), n_new, K)
        assert list(got[b]) == want_toks, (b, list(got[b]), want_toks)
        np.testing.assert_allclose(scores[b], want_score, atol=1e-4)


def test_beam_scores_at_least_greedy():
    """The best beam's total logprob can never be worse than greedy's
    (greedy is in the beam for K >= 1 on the same graph)."""
    ids = rng.integers(0, TINY.vocab_size, (1, 4)).astype(np.int64)
    _, s1 = BeamGenerator(TINY, batch=1, beam=1, prompt_len=4,
                          max_len=16).generate(ids, 5)
    _, s4 = BeamGenerator(TINY, batch=1, beam=4, prompt_len=4,
                          max_len=16).generate(ids, 5)
    assert s4[0] >= s1[0] - 1e-5


def test_beam_eos_freezes():
    """Rows that emit eos keep emitting eos; output stays length n_new."""
    ids = rng.integers(0, TINY.vocab_size, (1, 4)).astype(np.int64)
    probe, _ = BeamGenerator(TINY, batch=1, beam=2, prompt_len=4,
                             max_len=20).generate(ids, 3)
    eos = int(probe[0][1])  # force an eos the search will actually hit
    got, _ = BeamGenerator(TINY, batch=1, beam=2, prompt_len=4,
                           max_len=20).generate(ids, 8, eos_id=eos)
    assert got.shape == (1, 8)
    row = list(got[0])
    if eos in row:
        i = row.index(eos)
        assert all(t == eos for t in row[i:])


# -------------------------------------------------------------------------
# seq2seq beam (t5): cross-KV tiled K x, same shared loop
# -------------------------------------------------------------------------
def test_seq2seq_beam_one_is_greedy():
    from onnx_rusty_inference_engine_tpu.generate import (
        Seq2SeqBeamGenerator,
        Seq2SeqGenerator,
    )
    from onnx_rusty_inference_engine_tpu.models.t5 import TINY as T5

    src = rng.integers(0, T5.vocab_size, (2, 8)).astype(np.int64)
    want, _ = Seq2SeqGenerator(T5, batch=2, src_len=8,
                               max_len=16).generate(src, 6)
    got, _ = Seq2SeqBeamGenerator(T5, batch=2, beam=1, src_len=8,
                                  max_len=16).generate(src, 6)
    np.testing.assert_array_equal(got, want)


def test_seq2seq_beam_matches_sequential_replay():
    """beam=K verified against a cache-free-of-TILING reference: each
    candidate prefix replayed step-by-step on a BATCH-1-PER-BEAM decode
    (no K x cross tiling, no cache reorder in the candidate path)."""
    import jax as _jax

    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.generate import (
        Seq2SeqBeamGenerator,
    )
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models import seq2seq_family
    from onnx_rusty_inference_engine_tpu.models.t5 import TINY as T5

    K, n_new, S, ML = 3, 4, 8, 16
    fam = seq2seq_family("t5")
    src = rng.integers(0, T5.vocab_size, (1, S)).astype(np.int64)

    enc = Engine(import_model(fam.build_encoder(T5, batch=1, src_len=S)))(
        {"src_ids": src, "src_len": np.array([S], np.int64)})
    cross = {k: v for k, v in enc.items() if k.startswith("cross_")}
    dec = Engine(import_model(fam.build_decode(T5, batch=1, max_len=ML,
                                               src_len=S)))
    L = fam.n_layers(T5)

    def replay_logp(prefix):
        """log-probs after feeding start,prefix... sequentially, batch 1."""
        cache = {f"past_{k}_{i}": np.zeros((1, T5.n_head, ML,
                                            T5.head_dim), np.float32)
                 for i in range(L) for k in ("key", "value")}
        seq = [0] + list(prefix)
        for t, tok in enumerate(seq):
            feed = {"input_ids": np.array([[tok]], np.int64),
                    "pos": np.array([t], np.int64),
                    "src_len": np.array([S], np.int64)}
            feed.update(cross)
            feed.update(cache)
            out = dec(feed)
            for i in range(L):
                for k in ("key", "value"):
                    cache[f"past_{k}_{i}"] = out[f"present_{k}_{i}"]
        return np.asarray(_jax.nn.log_softmax(out["logits"][0, -1]))

    lp = replay_logp([])
    top = np.argsort(lp)[::-1][:K]
    beams = [([int(t)], float(lp[t])) for t in top]
    for _ in range(1, n_new):
        cands = []
        for seq, sc in beams:
            lp = replay_logp(seq)
            for t in np.argsort(lp)[::-1][:K]:
                cands.append((seq + [int(t)], sc + float(lp[t])))
        cands.sort(key=lambda x: -x[1])
        beams = cands[:K]
    want_toks, want_score = beams[0]

    bg = Seq2SeqBeamGenerator(T5, batch=1, beam=K, src_len=S, max_len=ML)
    got, scores = bg.generate(src, n_new)
    assert list(got[0]) == want_toks
    np.testing.assert_allclose(scores[0], want_score, atol=1e-4)


def test_device_beam_matches_host_loop():
    """device_loop=True folds ALL beam steps (expand/reorder included)
    into one lax.scan dispatch; beams and scores must match the host
    loop, with and without eos freezing."""
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)
    for eos in (None, 7):
        host = BeamGenerator(TINY, batch=2, beam=3, prompt_len=4,
                             max_len=16)
        dev = BeamGenerator(TINY, batch=2, beam=3, prompt_len=4,
                            max_len=16, device_loop=True)
        ht, hs = host.generate(ids, 6, eos_id=eos)
        dt, ds = dev.generate(ids, 6, eos_id=eos)
        np.testing.assert_array_equal(dt, ht)
        np.testing.assert_allclose(ds, hs, rtol=1e-5, atol=1e-5)


def test_device_beam_length_penalty():
    ids = rng.integers(0, TINY.vocab_size, (1, 4)).astype(np.int64)
    host = BeamGenerator(TINY, batch=1, beam=4, prompt_len=4, max_len=16)
    dev = BeamGenerator(TINY, batch=1, beam=4, prompt_len=4, max_len=16,
                        device_loop=True)
    ht, hs = host.generate(ids, 5, eos_id=3, length_penalty=0.8)
    dt, ds = dev.generate(ids, 5, eos_id=3, length_penalty=0.8)
    np.testing.assert_array_equal(dt, ht)
    np.testing.assert_allclose(ds, hs, rtol=1e-5, atol=1e-5)


def test_device_seq2seq_beam_matches_host_loop():
    from onnx_rusty_inference_engine_tpu.generate import (
        Seq2SeqBeamGenerator,
    )
    from onnx_rusty_inference_engine_tpu.models.t5 import TINY as T5_TINY

    src = rng.integers(1, T5_TINY.vocab_size, (2, 8)).astype(np.int64)
    lens = np.array([5, 8], np.int64)
    for eos in (None, 2):
        host = Seq2SeqBeamGenerator(T5_TINY, batch=2, beam=3, src_len=8,
                                    max_len=16)
        dev = Seq2SeqBeamGenerator(T5_TINY, batch=2, beam=3, src_len=8,
                                   max_len=16, device_loop=True)
        ht, hs = host.generate(src, 6, eos_id=eos, src_lengths=lens)
        dt, ds = dev.generate(src, 6, eos_id=eos, src_lengths=lens)
        np.testing.assert_array_equal(dt, ht)
        np.testing.assert_allclose(ds, hs, rtol=1e-5, atol=1e-5)
