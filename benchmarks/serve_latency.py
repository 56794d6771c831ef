"""SERVED decode throughput: wall-clock Generator.generate() including
every host dispatch — the number a client actually sees.

The chained benches (benchmarks/gpt2_decode.py) enqueue many steps and
amortize the tunnel roundtrip; real serving pays it per dispatch (the
chip shows ~96% idle on per-dispatch runs, PERF.md). device_loop=K folds
K decode steps + on-device sampling into ONE dispatch (lax.scan over
time), dividing that host cost by K — this bench measures exactly that
lever at the north-star GPT-2 config (12L/768d, INT4 weights + in-graph
INT8 KV), and via --family also for llama (GQA) and moe; --adapters N
attaches a LoRA bank to measure the adapter overhead on the same loop;
--temperature measures the sampled device loop vs greedy.

Usage: python benchmarks/serve_latency.py [--new 96] [--loops 0,8,24]
       [--family gpt2|llama|moe] [--adapters 3] [--temperature 0.8]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

from onnx_rusty_inference_engine_tpu.generate import Generator


def make_cfg(family: str, d: int, layers: int, max_len: int):
    if family == "gpt2":
        from onnx_rusty_inference_engine_tpu.models.gpt2 import GPT2Config

        return GPT2Config(n_embd=d, n_layer=layers, n_head=d // 64,
                          n_positions=max_len)
    if family == "llama":
        from onnx_rusty_inference_engine_tpu.models.llama import LlamaConfig

        return LlamaConfig(dim=d, n_layer=layers, n_head=d // 64,
                           n_kv_head=max(1, d // 192),
                           max_positions=max_len)
    if family == "moe":
        from onnx_rusty_inference_engine_tpu.models.moe import MoEConfig

        return MoEConfig(n_embd=d, n_layer=layers, n_head=d // 64,
                         n_positions=max_len)
    raise SystemExit(f"unknown family {family}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--new", type=int, default=96)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--max-len", type=int, default=128)
    ap.add_argument("--loops", default="0,8,24")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--family", default="gpt2",
                    choices=["gpt2", "llama", "moe"])
    ap.add_argument("--adapters", type=int, default=0,
                    help="attach a seeded N-adapter LoRA bank (overhead "
                         "measurement; gpt2 only)")
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="> 0: sampled device loop (on-device _select)")
    ap.add_argument("--int4", action="store_true", default=True)
    ap.add_argument("--no-int4", dest="int4", action="store_false")
    args = ap.parse_args()
    cfg = make_cfg(args.family, args.d, args.layers, args.max_len)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size,
                       (args.batch, 8)).astype(np.int64)

    gkw = dict(kv_dtype="int8", int4_weights=args.int4,
               family=args.family)
    if args.adapters:
        from onnx_rusty_inference_engine_tpu.graph import import_model
        from onnx_rusty_inference_engine_tpu.lora import make_adapter_stack
        from onnx_rusty_inference_engine_tpu.models import decoder_family

        build_prefill, _, _ = decoder_family(args.family)
        pg = import_model(build_prefill(cfg, batch=args.batch, seq_len=8,
                                        with_presents=True, past_len=0))
        gkw["lora_bank"] = make_adapter_stack(pg, n_adapters=args.adapters,
                                              rank=8,
                                              targets=("attn", "mlp"))
        gkw["adapter"] = 1
    skw = ({"temperature": args.temperature, "sample_seed": 7}
           if args.temperature > 0 else {})

    results = {}
    for k in [int(x) for x in args.loops.split(",")]:
        gen = Generator(cfg, batch=args.batch, prompt_len=8,
                        max_len=args.max_len, device_loop=k, **gkw)
        gen.generate(ids, min(args.new, 8), **skw)   # compile + calibrate
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            toks, _ = gen.generate(ids, args.new, **skw)
            best = min(best, time.perf_counter() - t0)
        tps = args.batch * args.new / best
        results[k] = tps
        print(json.dumps({
            "bench": "served_decode", "family": args.family,
            "device_loop": k, "batch": args.batch,
            "new_tokens": args.new, "adapters": args.adapters,
            "temperature": args.temperature,
            "wall_s": round(best, 4), "tokens_per_s": round(tps, 1),
        }))
    if 0 in results:
        for k, tps in results.items():
            if k:
                print(json.dumps({"bench": "served_speedup",
                                  "family": args.family,
                                  "device_loop": k,
                                  "vs_host_loop":
                                      round(tps / results[0], 2)}))


if __name__ == "__main__":
    main()
