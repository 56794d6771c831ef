"""Beam-search wall-clock: host loop (one dispatch per token) vs the
device-resident beam scan (ONE dispatch per generate) — the beam analog
of the greedy device-loop 9.1x (PERF.md "Served decode").

Usage (real chip): python benchmarks/beam_decode.py [--beam 4 --new 64]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

from onnx_rusty_inference_engine_tpu.generate import BeamGenerator
from onnx_rusty_inference_engine_tpu.models.gpt2 import GPT2Config


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--max-len", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    cfg = GPT2Config(n_embd=args.d, n_layer=args.layers,
                     n_head=args.d // 64, n_positions=args.max_len)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (args.batch, 8)).astype(np.int64)

    results = {}
    for dev in (False, True):
        bg = BeamGenerator(cfg, batch=args.batch, beam=args.beam,
                           prompt_len=8, max_len=args.max_len,
                           device_loop=dev)
        toks_warm, _ = bg.generate(ids, args.new)        # compile
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            toks, scores = bg.generate(ids, args.new)
            best = min(best, time.perf_counter() - t0)
        tps = args.batch * args.new / best
        results[dev] = (tps, toks)
        print(json.dumps({
            "bench": "beam_decode", "device_loop": dev,
            "batch": args.batch, "beam": args.beam,
            "new_tokens": args.new, "wall_s": round(best, 4),
            "tokens_per_s": round(tps, 1),
        }))
    assert np.array_equal(results[True][1], results[False][1]), \
        "device beam must match host beam"
    print(json.dumps({"bench": "beam_speedup",
                      "device_vs_host":
                          round(results[True][0] / results[False][0], 2)}))


if __name__ == "__main__":
    main()
