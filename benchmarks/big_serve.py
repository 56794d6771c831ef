"""SERVED wall-clock at production scale (VERDICT r4 #3): the capacity
models (big_decode.py's GPT-2-XL-class and Llama-7B-class int4+int8kv
presets) measured through Generator(device_loop=K) — true end-to-end
generate() time including every host dispatch, not chained step time.

The open question this answers: the 12L/768d K-sweep showed device_loop
amortizes the tunnel's per-dispatch tax away by K=96; at a 7.8-12.4 ms
step the dispatch tax is a much smaller FRACTION of a step, so how much
K does a big model actually need, and what admission latency does that
cost? (K steps = the window a mid-block arrival waits in a serving
setting; at 12.4 ms/step K=24 is already a ~300 ms admission window.)

Usage: python benchmarks/big_serve.py --model gpt2-xl [--loops 0,8,24,96]
       python benchmarks/big_serve.py --model llama-7b --loops 8,24,96
(--loops 0 = host loop; skip it for llama-7b unless you have the time.)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("gpt2-xl", "llama-3b", "llama-7b"),
                    default="gpt2-xl")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--new", type=int, default=96)
    ap.add_argument("--max-len", dest="max_len", type=int, default=256)
    ap.add_argument("--loops", default="0,8,24,96")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--layers", type=int, default=0,
                    help="override preset layer count (CPU sanity runs)")
    ap.add_argument("--dim", type=int, default=0,
                    help="override preset width (CPU sanity runs)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from onnx_rusty_inference_engine_tpu.generate import Generator

    B, L = args.batch, args.max_len
    if args.model == "gpt2-xl":
        from onnx_rusty_inference_engine_tpu.models.gpt2 import GPT2Config

        cfg = GPT2Config(n_positions=L, n_embd=args.dim or 1600,
                         n_layer=args.layers or 48,
                         n_head=(args.dim or 1600) // 64)
        family = "gpt2"
    else:
        from onnx_rusty_inference_engine_tpu.models.llama import LlamaConfig

        if args.model == "llama-3b":
            cfg = LlamaConfig(max_positions=L, dim=args.dim or 3072,
                              n_layer=args.layers or 26,
                              n_head=24, n_kv_head=8)
        else:
            cfg = LlamaConfig(max_positions=L, dim=args.dim or 4096,
                              n_layer=args.layers or 32)
        family = "llama"

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (B, 8)).astype(np.int64)

    results = {}
    for k in [int(x) for x in args.loops.split(",")]:
        t0 = time.time()
        gen = Generator(cfg, batch=B, prompt_len=8, max_len=L,
                        device_loop=k, kv_dtype="int8", int4_weights=True,
                        family=family)
        gen.generate(ids, min(args.new, 8))        # compile + calibrate
        setup_s = time.time() - t0
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            gen.generate(ids, args.new)
            best = min(best, time.perf_counter() - t0)
        tps = B * args.new / best
        results[k] = tps
        print(json.dumps({
            "bench": "big_served", "model": args.model,
            "device_loop": k, "batch": B, "new_tokens": args.new,
            "cache_len": L, "wall_s": round(best, 4),
            "tokens_per_s": round(tps, 1),
            "admission_window_ms": round(best / args.new * max(k, 1) * 1e3,
                                         1),
            "setup_s": round(setup_s, 1),
        }), flush=True)
        del gen
    if 0 in results:
        for k, tps in results.items():
            if k:
                print(json.dumps({
                    "bench": "big_served_speedup", "model": args.model,
                    "device_loop": k,
                    "vs_host_loop": round(tps / results[0], 2)}),
                    flush=True)


if __name__ == "__main__":
    main()
