"""Prefill (prompt-processing) throughput: tokens/s for the GPT-2 prefill
graph at serving prompt lengths — the MXU-bound half of LLM serving (the
decode benches cover the HBM-bound half). Compares fp32, bf16 compute, and
INT4 weight-only.

Run: python benchmarks/prefill.py [--layers 12 --d 768 --batch 8 --prompt 256]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--vocab", type=int, default=50257)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prompt", type=int, default=256)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models.gpt2 import (
        GPT2Config, build_gpt2)
    from onnx_rusty_inference_engine_tpu.quant import (
        quantize_matmuls_w8a8, quantize_weights_int4)
    from onnx_rusty_inference_engine_tpu.utils.timing import (
        engine_throughput)

    cfg = GPT2Config(vocab_size=args.vocab, n_positions=args.prompt,
                     n_embd=args.d, n_layer=args.layers, n_head=args.heads)
    B, P = args.batch, args.prompt
    g = import_model(build_gpt2(cfg, batch=B, seq_len=P,
                                with_presents=False))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (B, P)).astype(np.int64)
    feed = {"input_ids": ids}

    results = {}
    for label, eng in [
        ("fp32", Engine(g)),
        ("bf16", Engine(g, dtype="bfloat16")),
        ("int4_weights", Engine(quantize_weights_int4(g))),
        # dynamic W8A8: both matmul operands int8 on the MXU (~2× bf16
        # MXU rate); per-row activation scales computed in-graph
        ("w8a8", Engine(quantize_matmuls_w8a8(g))),
        ("w8a8_bf16", Engine(quantize_matmuls_w8a8(g), dtype="bfloat16")),
    ]:
        seq_per_s = engine_throughput(eng, feed, iters=args.iters)
        tok_s = seq_per_s * P
        results[label] = tok_s
        print(json.dumps({
            "metric": f"gpt2_prefill_{label}",
            "layers": cfg.n_layer, "d_model": cfg.n_embd,
            "batch": B, "prompt_len": P,
            "tokens_per_sec": round(tok_s, 0),
        }))
    print(json.dumps({"metric": "gpt2_prefill_bf16_speedup",
                      "value": round(results["bf16"] / results["fp32"], 3)}))
    print(json.dumps({"metric": "gpt2_prefill_w8a8_vs_bf16",
                      "value": round(results["w8a8_bf16"] / results["bf16"],
                                     3)}))


if __name__ == "__main__":
    main()
