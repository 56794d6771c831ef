"""Serving latency under load: open-loop Poisson arrivals against DecodeServer.

The serve_latency.py bench measures a closed 16-request burst (throughput
ceiling); this one measures what a production caller actually experiences:
requests arrive at an offered rate (open loop — arrivals don't wait for
completions), and we record per-request TTFT (time to first token, via the
on_token stream callback), TPOT (mean inter-token time after the first),
and end-to-end latency, as p50/p99 across the run, per offered rate.

The multi_step=K dispatch-amortization lever trades TTFT granularity for
throughput (a request admitted mid-block waits up to K steps): sweeping
--multi-step against the same rate grid quantifies that tradeoff on chip.

Reference parity note: the reference (/root/reference/src/main.rs) is a
one-shot CLI with no server; this documents OUR serving stack's
latency-under-load behavior (SURVEY.md §5 metrics/observability).

Run: python benchmarks/load_test.py --rates 2,8,24 --multi-step 8
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import threading
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--max-len", dest="max_len", type=int, default=256)
    p.add_argument("--prompt-min", type=int, default=8)
    p.add_argument("--prompt-max", type=int, default=48)
    p.add_argument("--max-new", dest="max_new", type=int, default=64)
    p.add_argument("--requests", type=int, default=48,
                   help="requests per offered-rate point")
    p.add_argument("--rates", default="2,8,24",
                   help="offered arrival rates (req/s), comma-separated")
    p.add_argument("--multi-step", dest="multi_step", type=int, default=8)
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--no-chunked", dest="chunked", action="store_false",
                   help="bucketed prefill instead of chunked (prompt pads "
                        "to --prompt-max; the XL-class sizing comparison)")
    p.add_argument("--fp32", action="store_true",
                   help="fp32 weights/KV instead of int4+int8kv")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--warm-timeout", dest="warm_timeout", type=float,
                   default=900.0,
                   help="first-compile budget: 48L-class chunked multi "
                        "graphs exceed 15 min through the remote tunnel")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from onnx_rusty_inference_engine_tpu.models.gpt2 import GPT2Config
    from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

    cfg = GPT2Config(n_positions=args.max_len, n_embd=args.dim,
                     n_layer=args.layers, n_head=max(1, args.dim // 64))
    server = DecodeServer(
        cfg, slots=args.slots, max_len=args.max_len,
        kv_dtype="float32" if args.fp32 else "int8",
        int4_weights=not args.fp32,
        prompt_len=args.prompt_max,
        chunked_prefill=args.chunked, chunk=args.chunk,
        multi_step=args.multi_step)
    rng = np.random.default_rng(0)

    def run_point(rate: float) -> dict:
        recs = []
        lock = threading.Lock()

        def submit_one(i: int) -> None:
            plen = int(rng.integers(args.prompt_min, args.prompt_max + 1))
            prompt = rng.integers(0, cfg.vocab_size, (plen,)).astype(np.int64)
            rec = {"t0": time.perf_counter(), "ttft": None, "times": []}

            def on_token(tok, rec=rec):
                t = time.perf_counter()
                if rec["ttft"] is None:
                    rec["ttft"] = t - rec["t0"]
                rec["times"].append(t)

            fut = server.submit(prompt, args.max_new, on_token=on_token)
            with lock:
                recs.append((rec, fut))

        # open loop: exponential inter-arrival gaps at the offered rate
        gaps = rng.exponential(1.0 / rate, size=args.requests)
        t_start = time.perf_counter()
        for i, gap in enumerate(gaps):
            time.sleep(gap)
            submit_one(i)
        for rec, fut in recs:
            toks = fut.result(timeout=600)
            rec["e2e"] = rec["times"][-1] - rec["t0"]
            rec["n"] = len(toks)
        wall = time.perf_counter() - t_start

        ttft = np.asarray([r["ttft"] for r, _ in recs])
        e2e = np.asarray([r["e2e"] for r, _ in recs])
        tpot = np.asarray([
            (r["times"][-1] - r["times"][0]) / max(1, len(r["times"]) - 1)
            for r, _ in recs])
        total_tokens = int(sum(r["n"] for r, _ in recs))
        return {
            "metric": "serve_load",
            "offered_req_s": rate,
            "achieved_req_s": round(args.requests / wall, 2),
            "served_tok_s": round(total_tokens / wall, 1),
            "ttft_p50_ms": round(float(np.percentile(ttft, 50)) * 1e3, 1),
            "ttft_p99_ms": round(float(np.percentile(ttft, 99)) * 1e3, 1),
            "tpot_p50_ms": round(float(np.percentile(tpot, 50)) * 1e3, 2),
            "tpot_p99_ms": round(float(np.percentile(tpot, 99)) * 1e3, 2),
            "e2e_p50_s": round(float(np.percentile(e2e, 50)), 3),
            "e2e_p99_s": round(float(np.percentile(e2e, 99)), 3),
            "multi_step": args.multi_step,
            "slots": args.slots,
            "requests": args.requests,
        }

    # warmup: compile every program (chunk graph + multi-step scan) before
    # the clock matters, so rate points compare steady-state behavior
    warm = server.submit(
        rng.integers(0, cfg.vocab_size, (args.prompt_min,)).astype(np.int64),
        args.multi_step or 2)
    warm.result(timeout=args.warm_timeout)

    for rate in (float(r) for r in args.rates.split(",")):
        print(json.dumps(run_point(rate)), flush=True)
    server.stop()


if __name__ == "__main__":
    main()
