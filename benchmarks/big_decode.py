"""Production-scale decode on ONE chip: the HBM-capacity story.

The 12L/768d benches (gpt2_decode.py / llama_decode.py) measure the serving
levers at GPT-2-small scale; this bench runs the same decode step at the
scales people actually deploy, where INT4 weight packing is the difference
between fitting a model on one chip and not:

  gpt2-xl  : 48L / 1600d / 25h, vocab 50257  (~1.6B params)
             fp32 fits 16 GB HBM (6.3 GB) -> fp32 vs int4+int8kv measured
  llama-3b : 26L / 3072d / 24h / 8kv, ffn 4x (~3.7B params)
             int4+int8kv (1.9 GB weights); fp32 (15 GB) skipped by default
  llama-7b : LlamaConfig() defaults, 32L / 4096d / 32h / 8kv (~8.1B params)
             int4-only: fp32 weights (32 GB) exceed the chip's HBM outright

Reference parity note: the reference engine (/root/reference/src, CNN-only,
batch-1 fp32) has no analog; this documents OUR framework's headline
capacity numbers for BASELINE.md config #5 at production scale.

Run: python benchmarks/big_decode.py --model llama-7b [--scan] [--fp32]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def _param_count(graph) -> int:
    return int(sum(int(np.prod(a.shape)) for a in graph.constants.values()))


def _const_bytes(graph) -> int:
    return int(sum(a.nbytes for a in graph.constants.values()))


def _hbm_in_use() -> int:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("bytes_in_use", 0))
    except Exception:
        return 0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=("gpt2-xl", "llama-3b", "llama-7b"),
                   default="gpt2-xl")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-len", dest="max_len", type=int, default=256)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--scan", action="store_true",
                   help="scan-over-layers form (compile-time-lean)")
    p.add_argument("--fp32", action="store_true",
                   help="also measure the fp32 variant (must fit HBM)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--layers", type=int, default=0,
                   help="override preset layer count (CPU sanity runs)")
    p.add_argument("--dim", type=int, default=0,
                   help="override preset width (CPU sanity runs)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.quant import quantize_weights_int4
    from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer

    B, L = args.batch, args.max_len
    if args.model == "gpt2-xl":
        from onnx_rusty_inference_engine_tpu.models.gpt2 import (
            GPT2Config, build_gpt2_decode)

        cfg = GPT2Config(n_positions=L, n_embd=args.dim or 1600,
                         n_layer=args.layers or 48, n_head=25)
        build = lambda **kw: build_gpt2_decode(cfg, batch=B, max_len=L, **kw)
        H_kv, hd, vocab = cfg.n_head, cfg.head_dim, cfg.vocab_size
        NL = cfg.n_layer
    else:
        from onnx_rusty_inference_engine_tpu.models.llama import (
            LlamaConfig, build_llama_decode)

        if args.model == "llama-3b":
            cfg = LlamaConfig(max_positions=L, dim=args.dim or 3072,
                              n_layer=args.layers or 26,
                              n_head=24, n_kv_head=8)
        else:
            cfg = LlamaConfig(max_positions=L, dim=args.dim or 4096,
                              n_layer=args.layers or 32)
        build = lambda **kw: build_llama_decode(cfg, batch=B, max_len=L, **kw)
        H_kv, hd, vocab = cfg.n_kv_head, cfg.head_dim, cfg.vocab_size
        NL = cfg.n_layer

    rng = np.random.default_rng(0)

    def make_feed(int8_kv: bool, stacked: bool):
        feed = {"input_ids": jnp.asarray(
                    rng.integers(0, vocab, (B, 1)).astype(np.int64)),
                "pos": jnp.full((B,), L // 2, dtype=np.int64)}
        shape = (B, H_kv, L, hd)
        for kind in ("key", "value"):
            kv = rng.standard_normal(shape).astype(np.float32)
            if int8_kv:
                q = np.clip(np.round(kv * 32), -127, 127).astype(np.int8)
                if stacked:
                    feed[f"past_{kind}"] = jnp.asarray(
                        np.broadcast_to(q, (NL,) + shape))
                    feed[f"kv_scale_{kind}"] = jnp.full((NL, H_kv), 1 / 32,
                                                        jnp.float32)
                else:
                    qd = jnp.asarray(q)
                    for i in range(NL):
                        feed[f"past_{kind}_{i}"] = qd
                        feed[f"kv_scale_{kind}_{i}"] = jnp.full(
                            (H_kv,), 1 / 32, jnp.float32)
            else:
                if stacked:
                    feed[f"past_{kind}"] = jnp.asarray(
                        np.broadcast_to(kv, (NL,) + shape))
                else:
                    kd = jnp.asarray(kv)
                    for i in range(NL):
                        feed[f"past_{kind}_{i}"] = kd
        return feed

    def bench(graph, label, feed, stacked: bool):
        t0 = time.time()
        eng = Engine(graph)
        w_bytes = _const_bytes(graph)

        def step(params, carry):
            out = eng._fn(params, carry)
            new = dict(carry)
            if stacked:
                new["past_key"] = out["present_key"]
                new["past_value"] = out["present_value"]
            else:
                for i in range(NL):
                    for kind in ("key", "value"):
                        new[f"past_{kind}_{i}"] = out[f"present_{kind}_{i}"]
            tok = jnp.argmax(out["logits"][:, -1, :], axis=-1)
            new["input_ids"] = tok[:, None].astype(jnp.int64)
            return new

        sec = device_loop_timer(step, feed, iters=args.iters,
                                params=eng.params)
        print(json.dumps({
            "metric": f"big_decode_{args.model}_{label}",
            "layers": NL, "dim": getattr(cfg, "dim", None) or cfg.n_embd,
            "batch": B, "cache_len": L,
            "params_b": round(_param_count(graph) / 1e9, 2),
            "weight_gb": round(w_bytes / 2**30, 2),
            "hbm_gb_in_use": round(_hbm_in_use() / 2**30, 2),
            "step_ms": round(sec * 1e3, 3),
            "tokens_per_sec": round(B / sec, 1),
            "setup_s": round(time.time() - t0, 1),
        }), flush=True)
        return sec

    kw = {"scan_layers": True} if args.scan else {}
    stacked = args.scan

    t0 = time.time()
    g_kv8 = import_model(build(kv_dtype="int8", **kw))
    print(json.dumps({"note": "built fp32 graph",
                      "params_b": round(_param_count(g_kv8) / 1e9, 2),
                      "build_s": round(time.time() - t0, 1)}), flush=True)
    t0 = time.time()
    g_int4 = quantize_weights_int4(g_kv8)
    print(json.dumps({"note": "int4-quantized",
                      "weight_gb": round(_const_bytes(g_int4) / 2**30, 2),
                      "quant_s": round(time.time() - t0, 1)}), flush=True)

    if args.fp32:
        g_f = import_model(build(**kw))
        bench(g_f, "fp32", make_feed(False, stacked), stacked)
        del g_f
    del g_kv8
    bench(g_int4, "int4_weights_int8_kv", make_feed(True, stacked), stacked)


if __name__ == "__main__":
    main()
