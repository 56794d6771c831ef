"""Cross-round numeric regression goldens.

The reference ships golden I/O pairs only for MNIST/SqueezeNet
(mnist_data_0.pb etc.); this extends the same idea to every synthesized
family: fixed-seed inputs through the fp32 engine, outputs pinned as
TensorProto .pb files (written by our own codec). Any future change that
shifts numerics beyond tolerance — an emitter rewrite, a pass reordering,
an XLA upgrade — fails here with the exact tensor that moved.

Regenerate intentionally with:  python tests/test_regression_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu import onnx_io
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _cases():
    from onnx_rusty_inference_engine_tpu.models.bert import TINY as BERT_TINY
    from onnx_rusty_inference_engine_tpu.models.bert import build_bert
    from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY as GPT_TINY
    from onnx_rusty_inference_engine_tpu.models.gpt2 import build_gpt2
    from onnx_rusty_inference_engine_tpu.models.llama import (
        TINY as LLAMA_TINY, build_llama)
    from onnx_rusty_inference_engine_tpu.models.mobilenet import (
        build_mobilenetv2)
    from onnx_rusty_inference_engine_tpu.models.resnet import build_resnet50
    from onnx_rusty_inference_engine_tpu.models.squeezenet import (
        build_squeezenet)
    from onnx_rusty_inference_engine_tpu.models.unet import (
        TINY as UNET_TINY, build_unet)
    from onnx_rusty_inference_engine_tpu.models.vit import (
        TINY as VIT_TINY, build_vit)
    from onnx_rusty_inference_engine_tpu.models.t5 import (
        TINY as T5_TINY, build_t5_encoder)
    from onnx_rusty_inference_engine_tpu.models.audio import (
        TINY as AUDIO_TINY, build_audio_encoder)
    from onnx_rusty_inference_engine_tpu.models.moe import (
        TINY as MOE_TINY, build_moe)

    rng = np.random.default_rng(123)
    img64 = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    img96 = rng.standard_normal((1, 3, 96, 96)).astype(np.float32)
    ids = rng.integers(0, 128, (1, 8)).astype(np.int64)
    return [
        ("squeezenet", lambda: build_squeezenet(),
         {"data_0": rng.standard_normal((1, 3, 224, 224)).astype(np.float32)},
         "softmaxout_1"),
        ("resnet50", lambda: build_resnet50(), {"data": img64}, "logits"),
        ("mobilenetv2", lambda: build_mobilenetv2(), {"input": img96},
         "output"),
        ("bert", lambda: build_bert(BERT_TINY, batch=1, seq_len=8),
         {"input_ids": ids % BERT_TINY.vocab_size,
          "token_type_ids": ids % 2,
          "attention_mask": np.ones((1, 8), np.int64)}, "pooler_output"),
        ("gpt2", lambda: build_gpt2(GPT_TINY, batch=1, seq_len=8,
                                    with_presents=False),
         {"input_ids": ids % GPT_TINY.vocab_size}, "logits"),
        ("llama", lambda: build_llama(LLAMA_TINY, batch=1, seq_len=8,
                                      with_presents=False),
         {"input_ids": ids % LLAMA_TINY.vocab_size}, "logits"),
        ("vit", lambda: build_vit(VIT_TINY, batch=1),
         {"pixel_values": rng.standard_normal(
             (1, 3, VIT_TINY.image_size, VIT_TINY.image_size)
         ).astype(np.float32)}, "logits"),
        ("unet", lambda: build_unet(UNET_TINY, batch=1, size=32),
         {"image": rng.standard_normal((1, 3, 32, 32)).astype(np.float32)},
         "mask_logits"),
        ("t5_encoder",
         lambda: build_t5_encoder(T5_TINY, batch=1, src_len=8),
         # full src_len -> the pad mask adds 0 everywhere, so the golden
         # from before the mask existed still holds bit-for-bit
         {"src_ids": ids % T5_TINY.vocab_size,
          "src_len": np.array([8], np.int64)}, "enc_out"),
        ("audio",
         lambda: build_audio_encoder(AUDIO_TINY, batch=1, n_samples=512),
         {"audio": (rng.standard_normal((1, 512)) * 0.1
                    ).astype(np.float32)}, "logits"),
        ("moe", lambda: build_moe(MOE_TINY, batch=1, seq_len=8),
         {"input_ids": ids % MOE_TINY.vocab_size}, "logits"),
        ("gpt2_int4kv_step", _build_int4_step,
         _int4_feed(GPT_TINY), "logits"),
        ("gpt2_lora", _build_lora,
         {"input_ids": ids % GPT_TINY.vocab_size,
          "lora_idx": np.array([1], np.int64)}, "logits"),
    ]


def _build_int4_step():
    from onnx_rusty_inference_engine_tpu.models.gpt2 import (
        TINY, build_gpt2_decode)

    return build_gpt2_decode(TINY, batch=1, max_len=16, kv_dtype="int4")


def _int4_feed(cfg):
    r = np.random.default_rng(7)
    feed = {"input_ids": r.integers(0, cfg.vocab_size,
                                    (1, 1)).astype(np.int64),
            "pos": np.array([5], np.int64)}
    for i in range(cfg.n_layer):
        for kind in ("key", "value"):
            feed[f"past_{kind}_{i}"] = r.integers(
                -128, 128,
                (1, cfg.n_head, 16, cfg.head_dim // 2)).astype(np.int8)
            feed[f"kv_scale_{kind}_{i}"] = np.full(
                (cfg.n_head,), 0.05, np.float32)
    return feed


def _build_lora():
    from onnx_rusty_inference_engine_tpu.lora import (
        attach_lora, make_adapter_stack)
    from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY, build_gpt2

    g = import_model(build_gpt2(TINY, batch=1, seq_len=8,
                                with_presents=False))
    bank = make_adapter_stack(g, n_adapters=2, rank=4,
                              targets=("attn", "mlp"), seed=5)
    return attach_lora(g, bank, alpha=8.0)  # Graph passes through import


def _compute(build, feed, out_name) -> np.ndarray:
    eng = Engine(import_model(build()))
    return np.asarray(eng.run(feed)[out_name], np.float32)


@pytest.mark.parametrize("name,build,feed,out_name",
                         _cases(), ids=lambda c: c if isinstance(c, str)
                         else "")
def test_regression_golden(name, build, feed, out_name):
    path = os.path.join(_DIR, f"{name}.pb")
    assert os.path.exists(path), \
        f"golden missing — regenerate: python {__file__}"
    golden = onnx_io.read_tensor_file(path)
    got = _compute(build, feed, out_name)
    assert got.shape == golden.array.shape, \
        f"{name}: output shape changed {got.shape} vs {golden.array.shape}"
    # run-to-run XLA-CPU conv reassociation wobbles ~1e-4 abs; real emitter
    # or pass regressions move outputs orders of magnitude more
    np.testing.assert_allclose(
        got, golden.array, rtol=1e-3, atol=1e-3,
        err_msg=f"{name}: output drifted from the pinned golden")


def _regenerate():
    os.makedirs(_DIR, exist_ok=True)
    for name, build, feed, out_name in _cases():
        out = _compute(build, feed, out_name)
        onnx_io.write_tensor_file(os.path.join(_DIR, f"{name}.pb"),
                                  out_name, out)
        print(f"wrote {name}.pb {out.shape}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    _regenerate()
