"""Multi-LoRA (lora.py): batched per-row adapter selection in ONE program.

Ground truth is weight folding: row b with adapter k must match the base
graph rerun with W + (alpha/r)*A[k]@B[k] substituted (fold_adapter). The
reference has no notion of adapters at all (one static model,
src/main.rs:16-24)."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.lora import (
    attach_lora,
    fold_adapter,
    make_adapter_stack,
)
from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY, build_gpt2
from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

rng = np.random.default_rng(11)
ALPHA = 8.0
TARGETS = ("attn", "mlp")


def _graph(batch=3, seq=8):
    return import_model(build_gpt2(TINY, batch=batch, seq_len=seq,
                                   with_presents=False))


def _bank(n=3, rank=4, seed=0):
    return make_adapter_stack(_graph(), n_adapters=n, rank=rank,
                              targets=TARGETS, seed=seed)


def test_zero_adapter_is_exactly_base():
    g = _graph()
    lg = attach_lora(g, _bank(), alpha=ALPHA)
    ids = rng.integers(0, TINY.vocab_size, (3, 8)).astype(np.int64)
    base = np.asarray(Engine(g)({"input_ids": ids})["logits"])
    out = np.asarray(Engine(lg)({
        "input_ids": ids, "lora_idx": np.zeros(3, np.int64)})["logits"])
    np.testing.assert_array_equal(out, base)


def test_mixed_adapters_match_folded_weights():
    """Rows [0, 1, 2] of one batch use adapters 0/1/2; each row must match
    the fold_adapter ground-truth graph."""
    g = _graph()
    bank = _bank()
    lg = attach_lora(g, bank, alpha=ALPHA)
    ids = rng.integers(0, TINY.vocab_size, (3, 8)).astype(np.int64)
    out = np.asarray(Engine(lg)({
        "input_ids": ids, "lora_idx": np.arange(3)})["logits"])
    for k in range(3):
        want = np.asarray(Engine(fold_adapter(g, bank, k, alpha=ALPHA))({
            "input_ids": ids})["logits"])
        np.testing.assert_allclose(out[k], want[k], atol=2e-5, rtol=1e-5)


def test_attach_to_int4_trunk():
    """The same bank attaches to an int4-quantized graph (weights renamed
    __w4); adapters stay fp32, zero adapter reproduces the int4 base."""
    from onnx_rusty_inference_engine_tpu.quant import quantize_weights_int4

    g = _graph()
    bank = _bank()
    q = quantize_weights_int4(g, min_elems=512)
    lq = attach_lora(q, bank, alpha=ALPHA)
    ids = rng.integers(0, TINY.vocab_size, (3, 8)).astype(np.int64)
    base = np.asarray(Engine(q)({"input_ids": ids})["logits"])
    out0 = np.asarray(Engine(lq)({
        "input_ids": ids, "lora_idx": np.zeros(3, np.int64)})["logits"])
    np.testing.assert_array_equal(out0, base)
    out1 = np.asarray(Engine(lq)({
        "input_ids": ids, "lora_idx": np.ones(3, np.int64)})["logits"])
    assert np.abs(out1 - base).max() > 1e-4  # the delta is really applied


def test_unknown_weight_rejected():
    with pytest.raises(ValueError, match="no such weight"):
        attach_lora(_graph(), {"nope_w": (np.zeros((2, 4, 2), np.float32),
                                          np.zeros((2, 2, 4), np.float32))})


def test_generator_zero_adapter_matches_plain():
    bank = _bank()
    kw = dict(batch=2, prompt_len=4, max_len=12)
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)
    want, _ = Generator(TINY, **kw).generate(ids, 6)
    got, _ = Generator(TINY, lora_bank=bank, lora_alpha=ALPHA, adapter=0,
                       **kw).generate(ids, 6)
    np.testing.assert_array_equal(got, want)


def test_generator_device_loop_lora_parity():
    """device_loop folds the lora_idx feed into the scanned decode body;
    tokens must match the host loop exactly."""
    bank = _bank()
    kw = dict(batch=2, prompt_len=4, max_len=16, lora_bank=bank,
              lora_alpha=ALPHA, adapter=1)
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)
    want, _ = Generator(TINY, **kw).generate(ids, 8)
    got, _ = Generator(TINY, device_loop=4, **kw).generate(ids, 8)
    np.testing.assert_array_equal(got, want)


def test_server_mixed_adapters_match_isolated():
    """Three concurrent requests on adapters 0/1/2 served from ONE
    compiled program must each equal their isolated generation."""
    bank = _bank()
    srv = DecodeServer(TINY, slots=3, prompt_len=6, max_len=20,
                       lora_bank=bank, lora_alpha=ALPHA)
    try:
        prompts = [rng.integers(0, TINY.vocab_size, (5,)).astype(np.int64)
                   for _ in range(3)]
        futs = [srv.submit(p, 5, adapter=k)
                for k, p in enumerate(prompts)]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        srv.stop()
    for k, (p, got) in enumerate(zip(prompts, outs)):
        gen = Generator(TINY, batch=1, prompt_len=5, max_len=20,
                        lora_bank=bank, lora_alpha=ALPHA, adapter=k)
        want, _ = gen.generate(p[None], 5)
        assert got == list(want[0]), (k, got, list(want[0]))


def test_server_adapter_requires_bank():
    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=12)
    try:
        with pytest.raises(ValueError, match="lora_bank"):
            srv.submit(np.array([1, 2, 3]), 2, adapter=1)
    finally:
        srv.stop()


def test_prompt_cache_is_adapter_keyed():
    """Same prompt under different adapters must NOT cross-hit; the same
    (prompt, adapter) pair must."""
    bank = make_adapter_stack(_graph(), n_adapters=3, rank=4,
                              targets=TARGETS, seed=3, scale=0.3)
    srv = DecodeServer(TINY, slots=2, prompt_len=6, max_len=20,
                       lora_bank=bank, lora_alpha=ALPHA, prompt_cache=8)
    try:
        p = rng.integers(0, TINY.vocab_size, (5,)).astype(np.int64)
        a1 = srv.submit(p, 4, adapter=1).result(timeout=300)
        a2 = srv.submit(p, 4, adapter=2).result(timeout=300)
        assert srv.prefix_hits == 0          # different adapters: no reuse
        a1b = srv.submit(p, 4, adapter=1).result(timeout=300)
        assert srv.prefix_hits == 1
        assert a1b == a1
        assert a1 != a2  # adapters genuinely change the generation
    finally:
        srv.stop()


def test_generator_lora_pipeline_parity():
    """lora_bank x pipeline_axis (round-4 verdict item 4): adapter deltas
    ride the GPipe trunk — the stacked bank weights shard per stage like
    any per-layer constant, lora_idx flows as a shared batch input. Must
    match the unpipelined LoRA Generator token-for-token, and compose
    with device_loop."""
    from onnx_rusty_inference_engine_tpu.parallel import make_mesh

    bank = _bank()
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)
    kw = dict(batch=2, prompt_len=4, max_len=16, lora_bank=bank,
              lora_alpha=ALPHA, adapter=1)
    want, _ = Generator(TINY, **kw).generate(ids, 8)

    mesh = make_mesh({"pipe": 2})
    got, _ = Generator(TINY, mesh=mesh, pipeline_axis="pipe",
                       **kw).generate(ids, 8)
    np.testing.assert_array_equal(got, want)

    # all three compose: LoRA x pipeline x device_loop
    got_dl, _ = Generator(TINY, mesh=mesh, pipeline_axis="pipe",
                          device_loop=4, **kw).generate(ids, 8)
    np.testing.assert_array_equal(got_dl, want)
