"""SERVED decode throughput: wall-clock Generator.generate() including
every host dispatch — the number a client actually sees.

The chained benches (benchmarks/gpt2_decode.py) enqueue many steps and
amortize the tunnel roundtrip; real serving pays it per dispatch (the
chip shows ~96% idle on per-dispatch runs, PERF.md). device_loop=K folds
K decode steps + on-device sampling into ONE dispatch (lax.scan over
time), dividing that host cost by K — this bench measures exactly that
lever at the north-star GPT-2 config (12L/768d, INT4 weights + in-graph
INT8 KV).

Usage: python benchmarks/serve_latency.py [--new 96] [--loops 0,8,24]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.models.gpt2 import GPT2Config


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--new", type=int, default=96)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--max-len", type=int, default=128)
    ap.add_argument("--loops", default="0,8,24")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    cfg = GPT2Config(n_embd=args.d, n_layer=args.layers,
                     n_head=args.d // 64, n_positions=args.max_len)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size,
                       (args.batch, 8)).astype(np.int64)

    results = {}
    for k in [int(x) for x in args.loops.split(",")]:
        gen = Generator(cfg, batch=args.batch, prompt_len=8,
                        max_len=args.max_len, kv_dtype="int8",
                        int4_weights=True, device_loop=k)
        gen.generate(ids, min(args.new, 8))          # compile + calibrate
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            toks, _ = gen.generate(ids, args.new)
            best = min(best, time.perf_counter() - t0)
        tps = args.batch * args.new / best
        results[k] = tps
        print(json.dumps({
            "bench": "served_decode", "device_loop": k,
            "batch": args.batch, "new_tokens": args.new,
            "wall_s": round(best, 4), "tokens_per_s": round(tps, 1),
        }))
    if 0 in results:
        for k, tps in results.items():
            if k:
                print(json.dumps({"bench": "served_speedup",
                                  "device_loop": k,
                                  "vs_host_loop":
                                      round(tps / results[0], 2)}))


if __name__ == "__main__":
    main()
