"""Speculative SERVING wall-clock on a self-repetitive workload
(VERDICT r3 #7: 'machinery without a measurement is half a feature').

Prompt-lookup mode (ngram=N) has ZERO draft dispatches — proposals come
from each slot's own context — so on repetitive text (code/doc
completion style) every accepted token is a free dispatch saved. This
bench builds prompts with a strong repeated n-gram structure, serves the
same requests through DecodeServer and SpeculativeServer(ngram=2), and
reports wall-clock tok/s plus the measured acceptance rate. Greedy
verification is lossless, so the streams must be identical — asserted.

Usage (real chip): python benchmarks/spec_serving.py [--layers 12 --d 768]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

from onnx_rusty_inference_engine_tpu.models.gpt2 import GPT2Config
from onnx_rusty_inference_engine_tpu.serve_llm import (
    DecodeServer, SpeculativeServer)


def repetitive_prompts(rng, n, plen, vocab):
    """Prompts made of a repeated short motif — the structure prompt
    lookup exploits (greedy continuations of repeated text repeat)."""
    out = []
    for _ in range(n):
        motif = rng.integers(0, vocab, (int(rng.integers(3, 6)),))
        reps = int(np.ceil(plen / motif.size))
        out.append(np.tile(motif, reps)[:plen].astype(np.int64))
    return out


def serve_all(srv, prompts, n_new):
    t0 = time.perf_counter()
    futs = [srv.submit(p, n_new) for p in prompts]
    outs = [f.result(timeout=1200) for f in futs]
    dt = time.perf_counter() - t0
    return outs, dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--vocab", type=int, default=50257)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--plen", type=int, default=32)
    ap.add_argument("--new", type=int, default=96)
    ap.add_argument("--max-len", type=int, default=256)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--ngram", type=int, default=2)
    ap.add_argument("--multi-step", dest="multi_step", type=int, default=0,
                    help="R speculation rounds per dispatch (device "
                         "prompt-lookup OR draft-model)")
    ap.add_argument("--draft-layers", dest="draft_layers", type=int,
                    default=0,
                    help="> 0: draft-MODEL speculation with an N-layer "
                         "draft (disables ngram). Acceptance on random "
                         "weights is near zero — this brackets the "
                         "dispatch economics from below.")
    ap.add_argument("--draft-same", dest="draft_same", action="store_true",
                    help="draft = the target itself (same seed): "
                         "acceptance ~1, the economics' upper bound")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    cfg = GPT2Config(vocab_size=args.vocab, n_positions=args.max_len,
                     n_embd=args.d, n_layer=args.layers,
                     n_head=args.heads)
    rng = np.random.default_rng(11)
    prompts = repetitive_prompts(rng, args.requests, args.plen, args.vocab)
    kw = dict(slots=args.slots, prompt_len=args.plen, max_len=args.max_len)

    skw = dict(k=args.k, multi_step=args.multi_step)
    if args.draft_same:
        skw.update(draft_cfg=cfg, draft_seed=0, target_seed=0)
        workload = "draft-same(acc~1)"
    elif args.draft_layers:
        skw["draft_cfg"] = GPT2Config(
            vocab_size=args.vocab, n_positions=args.max_len,
            n_embd=args.d, n_layer=args.draft_layers, n_head=args.heads)
        workload = f"draft-{args.draft_layers}L"
    else:
        skw["ngram"] = args.ngram
        workload = "repetitive-ngram"

    base = DecodeServer(cfg, **kw)
    base_out, _ = serve_all(base, prompts[:2], 4)       # warm compiles
    base_out, base_dt = serve_all(base, prompts, args.new)
    base.stop()

    spec = SpeculativeServer(cfg, **kw, **skw)
    _ = serve_all(spec, prompts[:2], 4)                 # warm compiles
    spec_out, spec_dt = serve_all(spec, prompts, args.new)
    acc = spec.stats().get("acceptance_rate")
    spec.stop()

    assert spec_out == base_out, "speculative serving must be lossless"
    total = args.requests * args.new
    print(json.dumps({
        "workload": workload,
        "baseline_tok_s": round(total / base_dt, 1),
        "spec_tok_s": round(total / spec_dt, 1),
        "speedup": round(base_dt / spec_dt, 3),
        "acceptance_rate": acc,
        "k": args.k, "ngram": skw.get("ngram", 0),
        "multi_step": args.multi_step,
        "requests": args.requests, "new": args.new,
    }))


if __name__ == "__main__":
    main()
