"""Dynamic W8A8 matmul quantization (quant.quantize_matmuls_w8a8): both
operands int8 on the MXU, per-row activation scales computed in-graph.
The MXU-bound PREFILL lever (decode stays INT4 weight-only — PERF.md).

Reference parity note: the reference has no quantization at all
(/root/reference/src/inference_engine/utils.rs:128-142, fp32-only)."""

import numpy as np

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer
from onnx_rusty_inference_engine_tpu.graph import Graph, Node, import_model
from onnx_rusty_inference_engine_tpu.models.gpt2 import (
    GPT2Config,
    build_gpt2,
)
from onnx_rusty_inference_engine_tpu.quant import quantize_matmuls_w8a8

rng = np.random.default_rng(11)


def _matmul_graph(M, K, N, batched=False):
    w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
    shape = (2, M, K) if batched else (M, K)
    g = Graph(
        name="mm",
        nodes=[Node("MatMul", ["x", "w"], ["y"])],
        constants={"w": w},
        inputs=[],
        outputs=["y"],
        opset=17,
        weight_names=["w"],
    )
    from onnx_rusty_inference_engine_tpu.graph import InputSpec

    g.inputs = [InputSpec("x", shape, np.dtype(np.float32))]
    return g, w, shape


def test_single_matmul_close_and_int8_on_wire():
    g, w, shape = _matmul_graph(16, 128, 64)
    gq = quantize_matmuls_w8a8(g, min_elems=64)
    ops = [n.op_type for n in gq.nodes]
    assert "MatMulInteger" in ops and "MatMul" not in ops
    # the fp32 weight is gone; the int8 weight + per-column scale remain
    assert "w" not in gq.constants
    assert gq.constants["w__w8"].dtype == np.int8
    assert gq.constants["w__w8s"].shape == (64,)

    x = rng.standard_normal(shape).astype(np.float32)
    y_ref = Engine(g).run({"x": x})["y"]
    y_q = Engine(gq).run({"x": x})["y"]
    rel = np.abs(np.asarray(y_q) - np.asarray(y_ref)).max() / (
        np.abs(np.asarray(y_ref)).max() + 1e-9)
    # per-row dynamic activations + per-column weights: int8-grid noise only
    assert rel < 0.02, rel


def test_batched_3d_activation():
    g, w, shape = _matmul_graph(8, 96, 32, batched=True)
    gq = quantize_matmuls_w8a8(g, min_elems=64)
    x = rng.standard_normal(shape).astype(np.float32)
    y_ref = np.asarray(Engine(g).run({"x": x})["y"])
    y_q = np.asarray(Engine(gq).run({"x": x})["y"])
    assert y_q.shape == y_ref.shape
    rel = np.abs(y_q - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    assert rel < 0.02, rel


def test_small_weights_untouched():
    g, _, _ = _matmul_graph(4, 8, 8)
    gq = quantize_matmuls_w8a8(g, min_elems=4096)
    assert [n.op_type for n in gq.nodes] == ["MatMul"]


def test_gpt2_prefill_top1_tracks_bf16_floor():
    """End-to-end on a random-weight GPT-2: w8a8's top-1 flip rate must sit
    near the bf16-cast conditioning floor (PERF.md MNV2 methodology) — the
    quantizer cannot beat the model's own margin on random weights."""
    cfg = GPT2Config(vocab_size=512, n_positions=32, n_embd=96, n_layer=2,
                     n_head=4)
    g = import_model(build_gpt2(cfg, batch=2, seq_len=16,
                                with_presents=False))
    ids = rng.integers(0, cfg.vocab_size, (2, 16)).astype(np.int64)
    ref = np.asarray(Engine(g).run({"input_ids": ids})["logits"])
    qq = np.asarray(Engine(quantize_matmuls_w8a8(g, min_elems=1024)).run(
        {"input_ids": ids})["logits"])
    bf = np.asarray(Engine(g, dtype="bfloat16").run(
        {"input_ids": ids})["logits"])
    flips_q = (ref.argmax(-1) != qq.argmax(-1)).mean()
    flips_bf = (ref.argmax(-1) != bf.argmax(-1)).mean()
    rel = np.abs(qq - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel
    assert flips_q <= flips_bf + 0.15, (flips_q, flips_bf)


# -- prefill_dtype="w8a8" plumbing (Generator / DecodeServer) ---------------

def test_generator_w8a8_prefill_decodes():
    gen = Generator(TINY, batch=1, prompt_len=6, max_len=24,
                    prefill_dtype="w8a8")
    prompt = rng.integers(0, TINY.vocab_size, (6,)).astype(np.int64)
    toks, _ = gen.generate(prompt[None], 5)
    assert toks.shape == (1, 5)
    assert (0 <= toks).all() and (toks < TINY.vocab_size).all()


def test_generator_w8a8_prefill_with_int8_kv():
    """Shadow calibration reads the w8a8 prefill's presents — scales must
    still produce a sane int8 decode stream."""
    gen = Generator(TINY, batch=1, prompt_len=7, max_len=24,
                    kv_dtype="int8", prefill_dtype="w8a8")
    prompt = rng.integers(0, TINY.vocab_size, (7,)).astype(np.int64)
    toks, _ = gen.generate(prompt[None], 5)
    assert toks.shape == (1, 5)


def test_server_w8a8_prefill_matches_isolated_w8a8():
    """Served tokens == isolated generation under the SAME prefill scheme
    (the repo's exactness bar, test_serve_llm.py pattern): the bucketed
    pad rows each carry their own per-row activation scale, so padding
    cannot perturb the real rows' quantization."""
    srv = DecodeServer(TINY, slots=2, prompt_len=8, max_len=24,
                       prefill_dtype="w8a8")
    try:
        for _ in range(3):
            plen = int(rng.integers(2, 9))
            n_new = int(rng.integers(2, 7))
            prompt = rng.integers(0, TINY.vocab_size,
                                  (plen,)).astype(np.int64)
            got = srv.submit(prompt, n_new).result(timeout=300)
            gen = Generator(TINY, batch=1, prompt_len=plen, max_len=24,
                            prefill_dtype="w8a8")
            want, _ = gen.generate(prompt[None], n_new)
            assert got == list(want[0]), (prompt, got, list(want[0]))
    finally:
        srv.stop()


def test_w8a8_prefill_composes_with_lora():
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.lora import make_adapter_stack
    from onnx_rusty_inference_engine_tpu.models import decoder_family

    build_prefill = decoder_family("gpt2")[0]
    pg = import_model(build_prefill(TINY, batch=1, seq_len=6))
    bank = make_adapter_stack(pg, n_adapters=2, rank=4,
                              targets=("attn", "mlp"))
    prompt = rng.integers(0, TINY.vocab_size, (6,)).astype(np.int64)
    outs = []
    for adapter in (0, 1):
        gen = Generator(TINY, batch=1, prompt_len=6, max_len=24,
                        prefill_dtype="w8a8", lora_bank=bank,
                        adapter=adapter)
        toks, _ = gen.generate(prompt[None], 6)
        outs.append(list(toks[0]))
    assert outs[0] != outs[1]  # the adapter delta reached the w8a8 prefill


def test_bf16_saturation_no_int8_wraparound():
    """Under the bf16 engine dtype the amax/127 scale and the x/s division
    each round, so x/s can land on exactly 127.5 -> Round -> 128, one past
    the int8 range. Float->int8 conversion of an out-of-range value is
    backend-defined in XLA (CPU saturates; a wrap to -128 flips the sign
    of the row's LARGEST activation) — the Clip inserted between Round and
    the int8 Cast pins the semantics on every backend. A=1.3359375 is a
    bf16 value that provably hits 127.5 (exhaustive bf16 simulation)."""
    g, w, shape = _matmul_graph(1, 128, 64)
    gq = quantize_matmuls_w8a8(g, min_elems=64)
    ops = [n.op_type for n in gq.nodes]
    assert ops.index("Round") < ops.index("Clip") < ops.index("Cast")

    x = np.zeros(shape, np.float32)
    x[0, 0] = 1.3359375  # bf16-exact; bf16((A/127 rounds down)) -> x/s=127.5
    y_ref = np.asarray(Engine(g).run({"x": x})["y"], np.float32)
    y_q = np.asarray(Engine(gq, dtype="bfloat16").run({"x": x})["y"],
                     np.float32)
    # a wrap would flip the sign of the whole row: rel error ~2.0
    rel = np.abs(y_q - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    assert rel < 0.1, rel
