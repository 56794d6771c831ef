"""Llama-family tests: RoPE/GQA/SwiGLU parity vs an independent torch
reimplementation, decode-vs-prefill consistency, INT4 quantization."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.llama import (
    TINY, LlamaConfig, build_llama, build_llama_decode)

rng = np.random.default_rng(109)

B, T = 2, 8


@pytest.fixture(scope="module")
def llama_graph():
    return import_model(build_llama(TINY, batch=B, seq_len=T))


def _ids():
    return rng.integers(0, TINY.vocab_size, (B, T)).astype(np.int64)


def test_llama_forward_shapes(llama_graph):
    out = Engine(llama_graph).run({"input_ids": _ids()})
    assert out["logits"].shape == (B, T, TINY.vocab_size)
    assert out["present_key_0"].shape == (B, TINY.n_kv_head, T,
                                          TINY.head_dim)
    assert np.all(np.isfinite(out["logits"]))


def test_llama_vs_torch_full_model(llama_graph):
    torch = pytest.importorskip("torch")

    g = llama_graph
    c = {k: torch.from_numpy(np.asarray(v).copy())
         for k, v in g.constants.items()}
    cfg = TINY
    D, H, Hkv, hd = cfg.dim, cfg.n_head, cfg.n_kv_head, cfg.head_dim
    ids = _ids()

    def rms(x, name):
        v = x.pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(v + 1e-5) * c[f"{name}_w"]

    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2) / hd))
    t = np.arange(T)[:, None] * inv[None, :]
    emb = np.concatenate([t, t], -1)
    cos = torch.from_numpy(np.cos(emb).astype(np.float32))  # [T, hd]
    sin = torch.from_numpy(np.sin(emb).astype(np.float32))

    def rope(x):  # [B, h, T, hd]
        rot = torch.cat([-x[..., hd // 2:], x[..., : hd // 2]], -1)
        return x * cos[None, None] + rot * sin[None, None]

    x = c["tok_embeddings"][torch.from_numpy(ids)]
    mask = torch.from_numpy(np.where(
        np.arange(T)[None, :] <= np.arange(T)[:, None], 0.0,
        -1e9).astype(np.float32))
    for i in range(cfg.n_layer):
        xn = rms(x, f"l{i}_attn_norm")
        q = (xn @ c[f"l{i}_wq_w"]).view(B, T, H, hd).transpose(1, 2)
        k = (xn @ c[f"l{i}_wk_w"]).view(B, T, Hkv, hd).transpose(1, 2)
        v = (xn @ c[f"l{i}_wv_w"]).view(B, T, Hkv, hd).transpose(1, 2)
        q, k = rope(q), rope(k)
        k = k.repeat_interleave(H // Hkv, dim=1)
        v = v.repeat_interleave(H // Hkv, dim=1)
        att = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(hd) + mask, -1)
        ctx = (att @ v).transpose(1, 2).reshape(B, T, D)
        x = x + ctx @ c[f"l{i}_wo_w"]
        hn = rms(x, f"l{i}_ffn_norm")
        gate = hn @ c[f"l{i}_wg_w"]
        h = torch.nn.functional.silu(gate) * (hn @ c[f"l{i}_wu_w"])
        x = x + h @ c[f"l{i}_wd_w"]
    logits = rms(x, "norm_f") @ c["lm_head"]

    got = Engine(llama_graph).run({"input_ids": ids})["logits"]
    np.testing.assert_allclose(got, logits.numpy(), rtol=2e-4, atol=2e-4)


def test_llama_gqa_kv_heads_shared(llama_graph):
    """GQA expansion: repeat_interleave semantics — query head h uses kv
    head h // (H/Hkv). Verified structurally by the torch parity test; here
    check the expand path exists (Hkv < H) and presents carry Hkv heads."""
    assert TINY.n_kv_head < TINY.n_head
    out = Engine(llama_graph).run({"input_ids": _ids()})
    assert out["present_value_1"].shape[1] == TINY.n_kv_head


def test_llama_decode_matches_prefill():
    max_len = 16
    pre = Engine(import_model(build_llama(TINY, batch=1, seq_len=4)))
    dec = Engine(import_model(build_llama_decode(TINY, batch=1,
                                                 max_len=max_len)))
    ids = rng.integers(0, TINY.vocab_size, (1, 4)).astype(np.int64)
    out = pre.run({"input_ids": ids})
    # run decode for the 5th token; compare against a 5-token prefill
    feed = {"input_ids": np.array([[7]], np.int64),
            "pos": np.array([4], np.int64)}
    for i in range(TINY.n_layer):
        for kind in ("key", "value"):
            kv = out[f"present_{kind}_{i}"]
            pad = max_len - kv.shape[2]
            feed[f"past_{kind}_{i}"] = np.pad(
                kv, ((0, 0), (0, 0), (0, pad), (0, 0)))
    step = dec.run(feed)
    ids5 = np.concatenate([ids, [[7]]], axis=1)
    pre5 = Engine(import_model(build_llama(TINY, batch=1, seq_len=5)))
    want = pre5.run({"input_ids": ids5})["logits"][:, -1]
    np.testing.assert_allclose(step["logits"][:, 0], want, rtol=1e-4,
                               atol=1e-4)


def test_llama_int4_weights():
    from onnx_rusty_inference_engine_tpu.quant import quantize_weights_int4

    g = import_model(build_llama(TINY, batch=1, seq_len=4,
                                 with_presents=False))
    g4 = quantize_weights_int4(g, min_elems=512)
    n4 = sum(1 for n in g4.nodes if n.op_type == "MatMulNBits")
    assert n4 >= 4 * TINY.n_layer  # wq/wo/wg/wu/wd + lm_head candidates
    ids = rng.integers(0, TINY.vocab_size, (1, 4)).astype(np.int64)
    ref = Engine(g).run({"input_ids": ids})["logits"]
    got = Engine(g4).run({"input_ids": ids})["logits"]
    # dim=32 random weights leave top-1 margins at the noise floor (see
    # PERF.md on synthetic-weight conditioning); assert logit-level fidelity
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.9, corr  # dim-32 toy: INT4 noise is large by construction
    assert np.all(np.isfinite(got))


def test_llama_generator_and_decode_server():
    """Llama through the shared decoder-family drivers: Generator greedy
    tokens match a manual prefill-extend loop; the continuous-batching
    server matches the Generator exactly."""
    from onnx_rusty_inference_engine_tpu.generate import Generator
    from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

    P, n_new = 4, 4
    ids = rng.integers(0, TINY.vocab_size, (1, P)).astype(np.int64)
    gen = Generator(TINY, batch=1, prompt_len=P, max_len=16, family="llama")
    toks, _ = gen.generate(ids, n_new)

    # manual reference: re-run prefill at increasing lengths
    cur = ids
    want = []
    for _ in range(n_new):
        g = import_model(build_llama(TINY, batch=1, seq_len=cur.shape[1],
                                     with_presents=False))
        logits = Engine(g).run({"input_ids": cur})["logits"]
        nxt = int(logits[0, -1].argmax())
        want.append(nxt)
        cur = np.concatenate([cur, [[nxt]]], axis=1)
    assert list(toks[0]) == want

    srv = DecodeServer(TINY, slots=2, prompt_len=P, max_len=16,
                       family="llama")
    try:
        got = srv.generate(ids[0], n_new, timeout=300)
    finally:
        srv.stop()
    assert got == want


def test_llama_int8_kv_generation():
    """In-graph INT8 GQA KV cache through the Generator driver."""
    from onnx_rusty_inference_engine_tpu.generate import Generator

    P, n_new = 4, 5
    ids = rng.integers(0, TINY.vocab_size, (1, P)).astype(np.int64)
    gen_f = Generator(TINY, batch=1, prompt_len=P, max_len=16,
                      family="llama")
    gen_q = Generator(TINY, batch=1, prompt_len=P, max_len=16,
                      family="llama", kv_dtype="int8")
    tok_f, log_f = gen_f.generate(ids, n_new, return_logits=True)
    tok_q, log_q = gen_q.generate(ids, n_new, return_logits=True)
    assert (tok_f == tok_q).mean() >= 0.6
    rel = np.abs(log_q[1] - log_f[1]).max() / np.abs(log_f[1]).max()
    assert rel < 0.15


def test_llama_sharded_decode_matches_replicated():
    """Tensor-sharded llama decode (matmul out-features over 'model'):
    tokens equal the replicated run."""
    from jax.sharding import NamedSharding, PartitionSpec as P_

    from onnx_rusty_inference_engine_tpu.generate import Generator
    from onnx_rusty_inference_engine_tpu.parallel import make_mesh

    mesh = make_mesh({"data": 1, "model": 4})

    def shard(name, arr):
        if arr.ndim == 2 and arr.shape[-1] % 4 == 0:
            return NamedSharding(mesh, P_(None, "model"))
        return NamedSharding(mesh, P_())

    ids = rng.integers(0, TINY.vocab_size, (1, 4)).astype(np.int64)
    with mesh:
        gen_s = Generator(TINY, batch=1, prompt_len=4, max_len=12,
                          family="llama", mesh=mesh, param_sharding_fn=shard)
        tok_s, _ = gen_s.generate(ids, 4)
    gen_r = Generator(TINY, batch=1, prompt_len=4, max_len=12,
                      family="llama")
    tok_r, _ = gen_r.generate(ids, 4)
    np.testing.assert_array_equal(tok_s, tok_r)
