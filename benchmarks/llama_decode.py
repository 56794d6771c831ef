"""Llama-family decode throughput (tokens/s): fp32 vs INT4 vs INT4+INT8-KV.

Same harness as gpt2_decode.py but for the GQA decoder: n_kv_head < n_head
shrinks the cache by H/Hkv, compounding with the INT8 cache quantization.

Run: python benchmarks/llama_decode.py [--layers 12 --dim 768 --batch 8]
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
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--kv-heads", dest="kv_heads", type=int, default=4)
    p.add_argument("--vocab", type=int, default=32000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-len", dest="max_len", type=int, default=256)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models.llama import (
        LlamaConfig, build_llama_decode)
    from onnx_rusty_inference_engine_tpu.quant import quantize_weights_int4
    from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer

    cfg = LlamaConfig(vocab_size=args.vocab, max_positions=args.max_len,
                      dim=args.dim, n_layer=args.layers, n_head=args.heads,
                      n_kv_head=args.kv_heads)
    B, L, Hkv, hd = args.batch, args.max_len, cfg.n_kv_head, cfg.head_dim
    rng = np.random.default_rng(0)

    NL = cfg.n_layer

    def make_feed(int8_kv: bool, stacked: bool = False,
                  int4_kv: bool = False):
        feed = {"input_ids": jnp.asarray(
                    rng.integers(0, cfg.vocab_size, (B, 1)).astype(np.int64)),
                "pos": jnp.full((B,), L // 2, dtype=jnp.int64)}
        shape = (NL, B, Hkv, L, hd) if stacked else (B, Hkv, L, hd)
        for kind in ("key", "value"):
            kv = rng.standard_normal(shape).astype(np.float32)
            if int4_kv:
                from onnx_rusty_inference_engine_tpu.quant import (
                    pack_int4_kv)

                sc = np.abs(kv).max(axis=(0, 2, 3)) / 7.0
                q = jnp.asarray(pack_int4_kv(
                    kv, sc[None, :, None, None].astype(np.float32)))
                for i in range(NL):
                    feed[f"past_{kind}_{i}"] = q
                    feed[f"kv_scale_{kind}_{i}"] = jnp.asarray(
                        sc.astype(np.float32))
                continue
            if int8_kv:
                q = jnp.asarray(
                    np.clip(np.round(kv * 32), -127, 127).astype(np.int8))
                if stacked:
                    feed[f"past_{kind}"] = q
                    feed[f"kv_scale_{kind}"] = jnp.full((NL, Hkv), 1 / 32,
                                                        jnp.float32)
                else:
                    for i in range(NL):
                        feed[f"past_{kind}_{i}"] = q
                        feed[f"kv_scale_{kind}_{i}"] = jnp.full(
                            (Hkv,), 1 / 32, jnp.float32)
            else:
                if stacked:
                    feed[f"past_{kind}"] = jnp.asarray(kv)
                else:
                    for i in range(NL):
                        feed[f"past_{kind}_{i}"] = jnp.asarray(kv)
        return feed

    def bench(graph, label, feed, stacked: bool = False):
        eng = Engine(graph)

        def step(params, carry):
            out = eng._fn(params, carry)
            new = dict(carry)
            if stacked:
                new["past_key"] = out["present_key"]
                new["past_value"] = out["present_value"]
            else:
                for i in range(cfg.n_layer):
                    for kind in ("key", "value"):
                        new[f"past_{kind}_{i}"] = out[f"present_{kind}_{i}"]
            tok = jnp.argmax(out["logits"][:, -1, :], axis=-1)
            new["input_ids"] = tok[:, None].astype(jnp.int64)
            return new

        sec = device_loop_timer(step, feed, iters=args.iters,
                                params=eng.params)
        print(json.dumps({
            "metric": f"llama_decode_{label}",
            "layers": cfg.n_layer, "dim": cfg.dim, "heads": cfg.n_head,
            "kv_heads": Hkv, "batch": B, "cache_len": L,
            "step_ms": round(sec * 1e3, 3),
            "tokens_per_sec": round(B / sec, 1),
        }))
        return sec

    g = import_model(build_llama_decode(cfg, batch=B, max_len=L))
    g_kv8 = import_model(build_llama_decode(cfg, batch=B, max_len=L,
                                            kv_dtype="int8"))
    g_fused_kv8 = import_model(build_llama_decode(cfg, batch=B, max_len=L,
                                                  kv_dtype="int8",
                                                  fused_attention=True))
    g_scan_kv8 = import_model(build_llama_decode(cfg, batch=B, max_len=L,
                                                 kv_dtype="int8",
                                                 scan_layers=True))
    t_f = bench(g, "fp32", make_feed(False))
    g_kv4 = import_model(build_llama_decode(cfg, batch=B, max_len=L,
                                            kv_dtype="int4"))
    t_48 = bench(quantize_weights_int4(g_kv8), "int4_weights_int8_kv",
                 make_feed(True))
    t_44 = bench(quantize_weights_int4(g_kv4), "int4_weights_int4_kv",
                 make_feed(False, int4_kv=True))
    t_f48 = bench(quantize_weights_int4(g_fused_kv8),
                  "int4_weights_int8_kv_fusedattn", make_feed(True))
    t_s48 = bench(quantize_weights_int4(g_scan_kv8),
                  "scan_int4_weights_int8_kv",
                  make_feed(True, stacked=True), stacked=True)
    print(json.dumps({"metric": "llama_decode_int4_int8kv_speedup",
                      "value": round(t_f / t_48, 3)}))
    print(json.dumps({"metric": "llama_decode_fusedattn_speedup",
                      "value": round(t_f / t_f48, 3)}))
    print(json.dumps({"metric": "llama_decode_scan_int4_int8kv_speedup",
                      "value": round(t_f / t_s48, 3)}))


if __name__ == "__main__":
    main()
