"""BERT encoder family tests: attention-mask plumbing, torch parity of the
full tiny model, int8 encoder quantization."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.bert import TINY, build_bert
from onnx_rusty_inference_engine_tpu.quant import quantize_graph

rng = np.random.default_rng(41)

B, T = 2, 12


@pytest.fixture(scope="module")
def bert_graph():
    return import_model(build_bert(TINY, batch=B, seq_len=T))


def _feed(mask=None):
    ids = rng.integers(0, TINY.vocab_size, (B, T)).astype(np.int64)
    seg = rng.integers(0, 2, (B, T)).astype(np.int64)
    if mask is None:
        mask = np.ones((B, T), np.int64)
    return {"input_ids": ids, "token_type_ids": seg,
            "attention_mask": mask.astype(np.int64)}


def test_bert_forward_shapes(bert_graph):
    out = Engine(bert_graph).run(_feed())
    assert out["last_hidden_state"].shape == (B, T, TINY.hidden)
    assert out["pooler_output"].shape == (B, TINY.hidden)
    assert np.all(np.abs(out["pooler_output"]) <= 1.0)  # tanh range


def test_attention_mask_blocks_padding(bert_graph):
    """Masked (padding) positions must not influence unmasked outputs."""
    eng = Engine(bert_graph)
    feed = _feed(mask=np.concatenate(
        [np.ones((B, T - 4)), np.zeros((B, 4))], axis=1))
    out1 = eng.run(feed)["last_hidden_state"]
    # change the token ids ONLY at masked positions
    feed2 = dict(feed)
    ids2 = feed["input_ids"].copy()
    ids2[:, -4:] = (ids2[:, -4:] + 7) % TINY.vocab_size
    feed2["input_ids"] = ids2
    out2 = eng.run(feed2)["last_hidden_state"]
    np.testing.assert_allclose(out1[:, : T - 4], out2[:, : T - 4],
                               rtol=1e-5, atol=1e-5)


def test_bert_vs_torch_full_model(bert_graph):
    """Independent reimplementation of the whole tiny BERT in torch."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    g = bert_graph
    c = {k: torch.from_numpy(np.asarray(v).copy())
         for k, v in g.constants.items()}
    cfg = TINY
    feed = _feed(mask=np.concatenate(
        [np.ones((B, T - 3)), np.zeros((B, 3))], axis=1))

    ids = torch.from_numpy(feed["input_ids"])
    seg = torch.from_numpy(feed["token_type_ids"])
    am = torch.from_numpy(feed["attention_mask"]).float()

    def ln(x, name):
        return F.layer_norm(x, (cfg.hidden,), c[f"{name}_g"], c[f"{name}_b"],
                            eps=1e-12)

    def lin(x, name):
        return x @ c[f"{name}_w"] + c[f"{name}_b"]

    # the position Gather is constant-folded at import (constant indices),
    # so the folded [T, D] table appears under the Gather's output name
    pe = c["pos_e"] if "pos_e" in c else c["pos_emb"][torch.arange(T)]
    x = c["word_emb"][ids] + pe + c["type_emb"][seg]
    x = ln(x, "emb_ln")
    bias = (1.0 - am).view(B, 1, 1, T) * -1e9
    H, hd = cfg.n_head, cfg.head_dim
    for i in range(cfg.n_layer):
        q = lin(x, f"l{i}_q").view(B, T, H, hd).transpose(1, 2)
        k = lin(x, f"l{i}_k").view(B, T, H, hd).transpose(1, 2)
        v = lin(x, f"l{i}_v").view(B, T, H, hd).transpose(1, 2)
        att = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(hd) + bias, -1)
        ctx = (att @ v).transpose(1, 2).reshape(B, T, cfg.hidden)
        x = ln(x + lin(ctx, f"l{i}_attn_out"), f"l{i}_ln1")
        h = F.gelu(lin(x, f"l{i}_ffn_in"))
        x = ln(x + lin(h, f"l{i}_ffn_out"), f"l{i}_ln2")
    pooled = torch.tanh(lin(x[:, 0], "pooler"))

    out = Engine(g).run(feed)
    np.testing.assert_allclose(out["last_hidden_state"], x.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(out["pooler_output"], pooled.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_bert_int8(bert_graph):
    feed = _feed()
    q = quantize_graph(bert_graph, calibration_inputs=[feed])
    n_qmm = sum(1 for n in q.nodes if n.op_type == "QLinearMatMul")
    # 6 weight matmuls per layer + pooler; attention act x act matmuls stay fp32
    assert n_qmm == 6 * TINY.n_layer + 1
    n_mm = sum(1 for n in q.nodes if n.op_type == "MatMul")
    assert n_mm == 2 * TINY.n_layer
    ref = Engine(bert_graph).run(feed)["pooler_output"]
    got = Engine(q).run(feed)["pooler_output"]
    assert np.abs(got - ref).max() < 0.15


def test_bert_int8_quantization(bert_graph):
    """Transformer INT8: weight matmuls become QLinearMatMul; the
    activation-by-activation attention contractions (scores, ctx) stay
    fp32 by design; outputs within ~1%."""
    from onnx_rusty_inference_engine_tpu.quant import quantize_graph

    feed = _feed()
    q = quantize_graph(bert_graph, calibration_inputs=[feed])
    ops = {}
    for n in q.nodes:
        ops[n.op_type] = ops.get(n.op_type, 0) + 1
    assert ops.get("QLinearMatMul", 0) >= 12
    assert ops.get("MatMul", 0) == 4  # 2 layers x (scores + ctx)
    of = Engine(bert_graph).run(feed)
    oq = Engine(q).run(feed)
    a = np.asarray(of.outputs["last_hidden_state"])
    b = np.asarray(oq.outputs["last_hidden_state"])
    assert np.abs(a - b).max() / np.abs(a).max() < 0.02
