"""Whisper-style ASR family (models/asr.py): raw waveform -> tokens
through ONE compiled encoder (STFT+mel+conv+transformer+cross-KV) and a
fixed-cache decoder. Served == isolated, int8 KV works, pipeline is
deterministic."""

import numpy as np

from onnx_rusty_inference_engine_tpu.generate import Seq2SeqGenerator
from onnx_rusty_inference_engine_tpu.models.asr import TINY, enc_frames

rng = np.random.default_rng(23)

N_SAMPLES = 512


def _wave(n=N_SAMPLES):
    t = np.arange(n) / TINY.sample_rate
    f = float(rng.uniform(50, 400))
    return (np.sin(2 * np.pi * f * t) * 0.5
            + rng.standard_normal(n) * 0.01).astype(np.float32)


def test_asr_pipeline_generates():
    gen = Seq2SeqGenerator(TINY, batch=2, src_len=N_SAMPLES, max_len=16,
                           family="asr")
    audio = np.stack([_wave(), _wave()])
    toks, _ = gen.generate(audio, 8)
    assert toks.shape == (2, 8)
    assert (toks >= 0).all() and (toks < TINY.vocab_size).all()
    # greedy determinism
    toks2, _ = gen.generate(audio, 8)
    np.testing.assert_array_equal(toks, toks2)
    # different audio -> (almost surely) different transcription path
    other, _ = gen.generate(np.stack([_wave(), _wave()]), 8)
    assert other.shape == (2, 8)


def test_asr_encoder_frames_helper():
    assert enc_frames(TINY, N_SAMPLES) == \
        ((N_SAMPLES - TINY.n_fft) // TINY.hop + 1) // 2


def test_asr_int8_kv_close_to_fp32():
    audio = np.stack([_wave()])
    ref, _ = Seq2SeqGenerator(TINY, batch=1, src_len=N_SAMPLES,
                              max_len=16, family="asr").generate(audio, 8)
    got, _ = Seq2SeqGenerator(TINY, batch=1, src_len=N_SAMPLES,
                              max_len=16, family="asr",
                              kv_dtype="int8").generate(audio, 8)
    assert (np.asarray(got)[:, :4] == np.asarray(ref)[:, :4]).mean() >= 0.5


def test_asr_server_matches_isolated_generation():
    """Audio continuous batching: each request's served tokens equal the
    isolated generator's for the same (identically padded) waveform."""
    from onnx_rusty_inference_engine_tpu.serve_llm import Seq2SeqServer

    srv = Seq2SeqServer(TINY, slots=2, src_len=N_SAMPLES, max_len=16,
                        family="asr")
    try:
        reqs = []
        for _ in range(4):
            n = int(rng.integers(N_SAMPLES // 2, N_SAMPLES + 1))
            wav = _wave(n)
            reqs.append((wav, srv.submit(wav, 6)))
        outs = [(wav, fut.result(timeout=300)) for wav, fut in reqs]
    finally:
        srv.stop()
    gen = Seq2SeqGenerator(TINY, batch=1, src_len=N_SAMPLES, max_len=16,
                           family="asr")
    for wav, got in outs:
        padded = np.zeros((1, N_SAMPLES), np.float32)
        padded[0, : wav.size] = wav
        want, _ = gen.generate(padded, 6)
        assert got == list(np.asarray(want)[0]), (got, want)
    assert srv.stats()["requests"] == 4
