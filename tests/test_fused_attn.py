"""FusedDecodeAttention (com.oriet): kernel correctness + graph parity.

The fused form must be numerically interchangeable with the unfused
QDQ attention chain for both decoder families (the CPU lowering is the
same math in fp32; the TPU lowering is the Pallas kernel,
ops/kernels/decode_attn.py, compile-checked separately on hardware).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY as GPT2_TINY
from onnx_rusty_inference_engine_tpu.models.gpt2 import build_gpt2_decode
from onnx_rusty_inference_engine_tpu.models.llama import TINY as LLAMA_TINY
from onnx_rusty_inference_engine_tpu.ops.kernels.decode_attn import (
    decode_attention_int8)

rng = np.random.default_rng(31)


@pytest.mark.parametrize("family,cfg", [("gpt2", GPT2_TINY),
                                        ("llama", LLAMA_TINY)])
def test_fused_attention_matches_unfused(family, cfg):
    P, N = 4, 6
    ids = rng.integers(0, cfg.vocab_size, (2, P)).astype(np.int64)
    outs = {}
    for fused in (False, True):
        gen = Generator(cfg, batch=2, prompt_len=P, max_len=P + N,
                        family=family, kv_dtype="int8",
                        fused_attention=fused)
        toks, logits = gen.generate(ids, N, return_logits=True)
        outs[fused] = (np.asarray(toks), np.asarray(logits[-1]))
    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    np.testing.assert_allclose(outs[False][1], outs[True][1],
                               rtol=1e-4, atol=1e-4)


def test_fused_attention_requires_int8():
    with pytest.raises(ValueError, match="int8"):
        build_gpt2_decode(GPT2_TINY, batch=1, max_len=8,
                          fused_attention=True)


@pytest.mark.parametrize("Hkv", [4, 2])
def test_decode_attention_kernel_interpret(Hkv):
    """Pallas kernel (interpret) vs numpy, incl. the GQA index map."""
    B, H, L, hd = 2, 4, 16, 64
    rep = H // Hkv
    # realistic magnitude: q carries the folded k-scale (~1/127) and
    # 1/sqrt(hd), keeping scores O(1) — large artificial scores amplify
    # the kernel's bf16 rounding through exp()
    q = (rng.standard_normal((B * H, 1, hd)) / (127 * np.sqrt(hd))
         ).astype(np.float32)
    k8 = rng.integers(-127, 127, (B * Hkv, L, hd)).astype(np.int8)
    v8 = rng.integers(-127, 127, (B * Hkv, L, hd)).astype(np.int8)
    bias = np.where(np.arange(L)[None, :] <= L // 2, 0.0, -1e9
                    ).astype(np.float32)
    bias = np.repeat(bias, B, 0)[:, None, :]
    out = np.asarray(decode_attention_int8(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(v8),
        jnp.asarray(bias), n_q_heads=H, interpret=True))
    qr = q.reshape(B, H, hd)
    kr = k8.reshape(B, Hkv, L, hd).astype(np.float32)
    vr = v8.reshape(B, Hkv, L, hd).astype(np.float32)
    for b in range(B):
        for h in range(H):
            s = qr[b, h] @ kr[b, h // rep].T + bias[b, 0]
            p = np.exp(s - s.max())
            p /= p.sum()
            ref = p @ vr[b, h // rep]
            # ctx values are O(100) (raw int8 weights); 0.5 abs ~ 0.5%
            np.testing.assert_allclose(out.reshape(B, H, hd)[b, h], ref,
                                       rtol=2e-2, atol=0.5)


def test_fused_decode_attention_single_node():
    """Single-node conformance for "FusedDecodeAttention" (com.oriet):
    the emitter's fallback path vs an inline numpy reference."""
    from onnx_rusty_inference_engine_tpu import onnx_io
    from util import attr, make_model

    B, H, Hkv, L, hd = 1, 4, 2, 8, 64
    rep = H // Hkv
    q = (rng.standard_normal((B, H, 1, hd)) * 0.02).astype(np.float32)
    k8 = rng.integers(-127, 127, (B, Hkv, L, hd)).astype(np.int8)
    v8 = rng.integers(-127, 127, (B, Hkv, L, hd)).astype(np.int8)
    sk = np.full((Hkv,), 0.02, np.float32)
    sv = np.full((Hkv,), 0.03, np.float32)
    bias = np.zeros((B, 1, 1, L), np.float32)
    n = onnx_io.NodeProto(
        op_type="FusedDecodeAttention", domain="com.oriet",
        input=["q", "k8", "v8", "sk", "sv", "bias"], output=["ctx"],
        attributes={"scale": attr("scale", 1.0 / np.sqrt(hd))})
    inputs = {"q": q, "k8": k8, "v8": v8, "sk": sk, "sv": sv, "bias": bias}
    m = make_model([n], inputs, ["ctx"], None, 17)
    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    out = Engine(import_model(m)).run(inputs).outputs["ctx"]
    for b in range(B):
        for h in range(H):
            kf = k8[b, h // rep].astype(np.float32) * sk[h // rep]
            vf = v8[b, h // rep].astype(np.float32) * sv[h // rep]
            s = (q[b, h, 0] @ kf.T) / np.sqrt(hd)
            p = np.exp(s - s.max()); p /= p.sum()
            np.testing.assert_allclose(out[b, h, 0], p @ vf,
                                       rtol=1e-4, atol=1e-4)


def test_decode_attention_int8_mxu_interpret():
    """The int8xint8 MXU formulation (opt-in via ORIET_ATTN_I8): dynamic
    q and prob quantization keeps relative error ~1-2% even for flat
    attention distributions (a fixed prob grid failed at 48%)."""
    from onnx_rusty_inference_engine_tpu.ops.kernels.decode_attn import (
        decode_attention_int8_mxu)

    B, H, L, hd = 2, 4, 32, 64
    q = (rng.standard_normal((B * H, 1, hd)) / (127 * np.sqrt(hd))
         ).astype(np.float32)
    k8 = rng.integers(-127, 127, (B * H, L, hd)).astype(np.int8)
    v8 = rng.integers(-127, 127, (B * H, L, hd)).astype(np.int8)
    bias = np.zeros((B, 1, L), np.float32)
    out = np.asarray(decode_attention_int8_mxu(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(v8),
        jnp.asarray(bias), n_q_heads=H, interpret=True))
    qr = q.reshape(B, H, hd)
    kr = k8.reshape(B, H, L, hd).astype(np.float32)
    vr = v8.reshape(B, H, L, hd).astype(np.float32)
    for b in range(B):
        for h in range(H):
            s = qr[b, h] @ kr[b, h].T
            p = np.exp(s - s.max())
            p /= p.sum()
            ref = p @ vr[b, h]
            rel = np.abs(out.reshape(B, H, hd)[b, h] - ref).max() / (
                np.abs(ref).max() + 1e-9)
            assert rel < 0.05, rel
