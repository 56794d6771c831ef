"""INT4 nibble-packed KV cache (gpt2 family): [B,H,L,hd/2] int8 cache,
p = (q0+8) + 16*q1 with q in [-8,7]; quantize/pack/update/unpack all
in-graph (models/gpt2.py), halving KV HBM traffic vs int8 on the
bandwidth-bound decode read."""

import numpy as np

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.gpt2 import (
    TINY,
    build_gpt2_decode,
)

rng = np.random.default_rng(47)
H, HD, L = TINY.n_head, TINY.head_dim, TINY.n_layer


def _scales(v=0.05):
    return {f"kv_scale_{k}_{i}": np.full((H,), v, np.float32)
            for i in range(L) for k in ("key", "value")}


def _pack(q):
    return ((q[..., 0::2] + 8) + 16 * q[..., 1::2]).astype(np.int8)


def _unpack(p):
    q1 = np.floor((p.astype(np.float64) + 128) / 16) - 8
    q0 = p - 16 * q1 - 8
    out = np.empty(p.shape[:-1] + (p.shape[-1] * 2,))
    out[..., 0::2] = q0
    out[..., 1::2] = q1
    return out


def test_step_matches_fp32_on_grid_cache():
    """With the past cache on the int4 grid (exactly representable), the
    only divergence from fp32 is the NEW token's k/v quantization — and
    the emitted present must equal numpy quantization of the fp32
    present bit-for-bit (pack/unpack machinery exact)."""
    B, ML, s = 2, 16, 0.05
    g4 = import_model(build_gpt2_decode(TINY, batch=B, max_len=ML,
                                        kv_dtype="int4"))
    gf = import_model(build_gpt2_decode(TINY, batch=B, max_len=ML))
    feed4 = {"input_ids": rng.integers(0, TINY.vocab_size,
                                       (B, 1)).astype(np.int64),
             "pos": np.array([3, 5], np.int64), **_scales(s)}
    feedf = {k: v for k, v in feed4.items()
             if not k.startswith("kv_scale")}
    for i in range(L):
        for k in ("key", "value"):
            q = rng.integers(-8, 8, (B, H, ML, HD)).astype(np.float32)
            feedf[f"past_{k}_{i}"] = q * s
            feed4[f"past_{k}_{i}"] = _pack(q)
    o4, of = Engine(g4)(feed4), Engine(gf)(feedf)
    np.testing.assert_allclose(np.asarray(o4["logits"]),
                               np.asarray(of["logits"]), atol=0.05)
    for i in range(L):
        for k in ("key", "value"):
            p4 = np.asarray(o4[f"present_{k}_{i}"])
            assert p4.dtype == np.int8 and p4.shape == (B, H, ML, HD // 2)
            want = np.clip(np.round(
                np.asarray(of[f"present_{k}_{i}"]) / s), -8, 7)
            diff = np.abs(_unpack(p4) - want)
            # f32 (graph) vs f64 (numpy) round-to-nearest ties may land
            # one step apart; anything larger means broken pack/unpack
            assert diff.max() <= 1
            assert (diff > 0).mean() < 0.01


def test_chunk_equals_sequential_steps():
    """chunk=k int4 decode == k sequential int4 steps EXACTLY (identical
    quantization per token, packed-domain scatter)."""
    B, ML, k = 2, 16, 4
    g1 = import_model(build_gpt2_decode(TINY, batch=B, max_len=ML,
                                        kv_dtype="int4"))
    gk = import_model(build_gpt2_decode(TINY, batch=B, max_len=ML,
                                        kv_dtype="int4", chunk=k))
    e1, ek = Engine(g1), Engine(gk)
    sc = _scales()
    ids = rng.integers(0, TINY.vocab_size, (B, k)).astype(np.int64)
    pos0 = np.array([2, 5], np.int64)
    cache = {f"past_{kk}_{i}": rng.integers(
        -128, 128, (B, H, ML, HD // 2)).astype(np.int8)
        for i in range(L) for kk in ("key", "value")}

    ck = dict(cache)
    ok = ek({"input_ids": ids, "pos": pos0, **ck, **sc})
    c1 = dict(cache)
    for j in range(k):
        o1 = e1({"input_ids": ids[:, j:j + 1], "pos": pos0 + j,
                 **c1, **sc})
        for i in range(L):
            for kk in ("key", "value"):
                c1[f"past_{kk}_{i}"] = o1[f"present_{kk}_{i}"]
    np.testing.assert_allclose(np.asarray(ok["logits"][:, -1]),
                               np.asarray(o1["logits"][:, -1]),
                               atol=2e-5, rtol=1e-5)
    for i in range(L):
        for kk in ("key", "value"):
            np.testing.assert_array_equal(
                np.asarray(ok[f"present_{kk}_{i}"]),
                np.asarray(c1[f"past_{kk}_{i}"]))


def test_generator_int4_kv():
    """End-to-end generation with the packed cache: deterministic, and
    the FIRST token (pure prefill, no KV quantization involved) matches
    fp32 exactly."""
    kw = dict(batch=2, prompt_len=4, max_len=16)
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)
    tf, _ = Generator(TINY, **kw).generate(ids, 6)
    g = Generator(TINY, kv_dtype="int4", **kw)
    t1, _ = g.generate(ids, 6)
    t2, _ = g.generate(ids, 6)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(t1[:, 0], tf[:, 0])
    assert t1.shape == (2, 6)


def test_generator_int4_device_loop_parity():
    """device_loop folds the packed cache into the scanned carry; tokens
    must equal the int4 host loop exactly."""
    kw = dict(batch=2, prompt_len=4, max_len=20, kv_dtype="int4")
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)
    want, _ = Generator(TINY, **kw).generate(ids, 8)
    got, _ = Generator(TINY, device_loop=4, **kw).generate(ids, 8)
    np.testing.assert_array_equal(got, want)


def test_decode_server_int4_kv():
    """Continuous batching over the packed cache: resolves, deterministic
    across slot reuse, and greedy tokens mostly match fp32 (int4 is
    lossier than int8 — machinery exactness is covered by the chunk and
    present tests above)."""
    from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

    prompt = rng.integers(0, TINY.vocab_size, (5,)).astype(np.int64)
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24,
                       kv_dtype="int4")
    try:
        got = srv.generate(prompt, 6, timeout=300)
        again = srv.generate(prompt, 6, timeout=300)  # reused slot
    finally:
        srv.stop()
    assert got == again
    gen = Generator(TINY, batch=1, prompt_len=5, max_len=24)
    want = list(gen.generate(prompt[None], 6)[0][0])
    agree = np.mean([g == w for g, w in zip(got, want)])
    assert agree >= 0.5, (got, want)


# ---------------------------------------------------------------------------
# llama (GQA) int4 KV — round 4: the nibble-packed cache is no longer
# gpt2-only. Hkv < H heads, same pack/unpack arithmetic.
# ---------------------------------------------------------------------------
def test_llama_int4_step_matches_fp32_on_grid_cache():
    """Past cache exactly on the int4 grid with per-head scales
    CALIBRATED to the new token's k/v magnitude (what Generator/server
    do: amax/7) — llama's k/v run ~50x larger than the gpt2 TINY's, so a
    fixed tiny scale would clip the new token to garbage. Layer-0
    presents must equal numpy quantization of the fp32 presents to one
    rounding step; logits agree to quantization noise."""
    from onnx_rusty_inference_engine_tpu.models.llama import (
        TINY as LTINY, build_llama_decode)

    LHkv, Lhd, LL = LTINY.n_kv_head, LTINY.head_dim, LTINY.n_layer
    B, max_len = 2, 12
    g4 = import_model(build_llama_decode(LTINY, batch=B, max_len=max_len,
                                         kv_dtype="int4"))
    gf = import_model(build_llama_decode(LTINY, batch=B, max_len=max_len))
    e4, ef = Engine(g4), Engine(gf)

    ids = rng.integers(0, LTINY.vocab_size, (B, 1)).astype(np.int64)
    pos = np.array([3, 5], np.int64)
    # pass 1: fp32 probe on an empty cache -> per-head scales amax/7
    probe = {"input_ids": ids, "pos": pos}
    for i in range(LL):
        for kk in ("key", "value"):
            probe[f"past_{kk}_{i}"] = np.zeros((B, LHkv, max_len, Lhd),
                                               np.float32)
    pout = ef(probe)
    scales = {}
    for i in range(LL):
        for kk in ("key", "value"):
            kv = np.asarray(pout[f"present_{kk}_{i}"])
            scales[f"{kk}_{i}"] = np.maximum(
                np.abs(kv).max(axis=(0, 2, 3)), 1e-6) / 7.0

    feed4 = {"input_ids": ids, "pos": pos}
    feedf = dict(feed4)
    for i in range(LL):
        for kk in ("key", "value"):
            sh = scales[f"{kk}_{i}"].astype(np.float32)   # [Hkv]
            q = rng.integers(-8, 8, (B, LHkv, max_len, Lhd)
                             ).astype(np.float32)
            feed4[f"past_{kk}_{i}"] = _pack(q)
            feed4[f"kv_scale_{kk}_{i}"] = sh
            feedf[f"past_{kk}_{i}"] = q * sh[None, :, None, None]
    o4, of = e4(feed4), ef(feedf)
    np.testing.assert_allclose(np.asarray(o4["logits"]),
                               np.asarray(of["logits"]), atol=0.08)
    # layer 0 sees identical inputs in both graphs: presents must match
    # numpy quantization bit-for-bit (one rounding-tie step allowed)
    for kk in ("key", "value"):
        p4 = np.asarray(o4[f"present_{kk}_0"])
        assert p4.dtype == np.int8 and p4.shape == (B, LHkv, max_len,
                                                    Lhd // 2)
        sh = scales[f"{kk}_0"][None, :, None, None]
        want = np.clip(np.round(
            np.asarray(of[f"present_{kk}_0"]) / sh), -8, 7)
        diff = np.abs(_unpack(p4) - want)
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.01


def test_llama_int4_chunk_equals_sequential_steps():
    from onnx_rusty_inference_engine_tpu.models.llama import (
        TINY as LTINY, build_llama_decode)

    LHkv, Lhd, LL = LTINY.n_kv_head, LTINY.head_dim, LTINY.n_layer
    B, max_len, C = 2, 16, 3
    g1 = import_model(build_llama_decode(LTINY, batch=B, max_len=max_len,
                                         kv_dtype="int4"))
    gc = import_model(build_llama_decode(LTINY, batch=B, max_len=max_len,
                                         kv_dtype="int4", chunk=C))
    e1, ec = Engine(g1), Engine(gc)
    scales = {f"kv_scale_{k}_{i}": np.full((LHkv,), 0.05, np.float32)
              for i in range(LL) for k in ("key", "value")}
    cache = {f"past_{k}_{i}": np.zeros((B, LHkv, max_len, Lhd // 2),
                                       np.int8)
             for i in range(LL) for k in ("key", "value")}
    toks = rng.integers(0, LTINY.vocab_size, (B, C)).astype(np.int64)
    pos0 = np.array([0, 2], np.int64)

    c1 = dict(cache)
    for j in range(C):
        out = e1({"input_ids": toks[:, j:j + 1], "pos": pos0 + j,
                  **c1, **scales})
        for i in range(LL):
            for kk in ("key", "value"):
                c1[f"past_{kk}_{i}"] = out[f"present_{kk}_{i}"]
    last1 = out["logits"]

    outc = ec({"input_ids": toks, "pos": pos0, **cache, **scales})
    np.testing.assert_allclose(np.asarray(outc["logits"][:, -1]),
                               np.asarray(last1[:, -1]),
                               rtol=1e-4, atol=1e-4)
    for i in range(LL):
        for kk in ("key", "value"):
            np.testing.assert_array_equal(
                np.asarray(outc[f"present_{kk}_{i}"]),
                np.asarray(c1[f"past_{kk}_{i}"]))


def test_llama_int4_generator_and_server():
    from onnx_rusty_inference_engine_tpu.models.llama import TINY as LTINY
    from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

    kw = dict(batch=2, prompt_len=4, max_len=16, family="llama")
    ids = rng.integers(0, LTINY.vocab_size, (2, 4)).astype(np.int64)
    tf, _ = Generator(LTINY, **kw).generate(ids, 6)
    g = Generator(LTINY, kv_dtype="int4", **kw)
    t1, _ = g.generate(ids, 6)
    t2, _ = g.generate(ids, 6)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(t1[:, 0], tf[:, 0])  # prefill exact

    # device loop parity over the packed GQA cache
    got, _ = Generator(LTINY, kv_dtype="int4", device_loop=3,
                       **kw).generate(ids, 6)
    np.testing.assert_array_equal(got, t1)

    prompt = rng.integers(0, LTINY.vocab_size, (5,)).astype(np.int64)
    srv = DecodeServer(LTINY, slots=2, prompt_len=8, max_len=24,
                       kv_dtype="int4", family="llama")
    try:
        a = srv.generate(prompt, 6, timeout=300)
        b = srv.generate(prompt, 6, timeout=300)
    finally:
        srv.stop()
    assert a == b


def test_decode_server_int4_chunked_prefill():
    """int4 KV x chunked_prefill (round-4 verdict item 4): shadow-fp32
    calibration on the first prompt, then the nibble-packed chunk graph.
    Deterministic across slot reuse; tokens mostly track fp32 (int4 is
    the lossier grid — machinery exactness is covered by the chunk and
    present tests above)."""
    from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

    srv = DecodeServer(TINY, slots=2, max_len=32, kv_dtype="int4",
                       chunked_prefill=True, chunk=4)
    try:
        prompts = [rng.integers(0, TINY.vocab_size, (int(p),)).astype(
            np.int64) for p in (6, 11)]
        futs = [srv.submit(p, 6) for p in prompts]
        outs = [f.result(timeout=300) for f in futs]
        # packed cache after the calibration flip: hd axis halved
        name = next(iter(srv._cache))
        assert srv._cache[name].dtype == np.int8
        assert srv._cache[name].shape[-1] == HD // 2
        again = srv.submit(prompts[0], 6).result(timeout=300)
    finally:
        srv.stop()
    assert again == outs[0]                  # deterministic slot reuse
    for p, got in zip(prompts, outs):
        gen = Generator(TINY, batch=1, prompt_len=p.size, max_len=32)
        want = [int(t) for t in gen.generate(p[None], 6)[0][0]]
        agree = np.mean([g == w for g, w in zip(got, want)])
        assert agree >= 0.5, (p.size, got, want)


def test_decode_server_int4_chunked_multi_step():
    """int4 x chunked x multi_step: the K-step device block engages after
    the calibration flip and emits the same tokens as single-step."""
    from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

    p = rng.integers(0, TINY.vocab_size, (7,)).astype(np.int64)
    outs = []
    for ms in (0, 3):
        srv = DecodeServer(TINY, slots=2, max_len=32, kv_dtype="int4",
                           chunked_prefill=True, chunk=4, multi_step=ms)
        try:
            outs.append(srv.generate(p, 8, timeout=300))
        finally:
            srv.stop()
    assert outs[0] == outs[1]
