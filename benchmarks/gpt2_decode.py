"""GPT-2 decode throughput benchmark (tokens/s) — fp32 vs INT4 weights.

The decode step is memory-bandwidth-bound by weight reads; INT4 weight-only
cuts that traffic ~8x for the matmuls. Measures the fixed-cache decode
graph's steady-state step latency with the on-device chained harness.

Run: python benchmarks/gpt2_decode.py [--layers 12 --d 768 --batch 8]
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
    p.add_argument("--max-len", type=int, default=256)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models.gpt2 import (
        GPT2Config, build_gpt2_decode)
    from onnx_rusty_inference_engine_tpu.quant import quantize_weights_int4
    from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer

    cfg = GPT2Config(vocab_size=args.vocab, n_positions=args.max_len,
                     n_embd=args.d, n_layer=args.layers, n_head=args.heads)
    g = import_model(build_gpt2_decode(cfg, batch=args.batch,
                                       max_len=args.max_len))
    g_kv8 = import_model(build_gpt2_decode(cfg, batch=args.batch,
                                           max_len=args.max_len,
                                           kv_dtype="int8"))
    g_fused_kv8 = import_model(build_gpt2_decode(cfg, batch=args.batch,
                                                 max_len=args.max_len,
                                                 kv_dtype="int8",
                                                 fused_attention=True))
    g_scan = import_model(build_gpt2_decode(cfg, batch=args.batch,
                                            max_len=args.max_len,
                                            scan_layers=True))
    g_scan_kv8 = import_model(build_gpt2_decode(cfg, batch=args.batch,
                                                max_len=args.max_len,
                                                kv_dtype="int8",
                                                scan_layers=True))

    rng = np.random.default_rng(0)
    B, H, L, hd = args.batch, cfg.n_head, args.max_len, cfg.head_dim
    NL = cfg.n_layer

    def make_feed(int8_kv: bool, stacked: bool = False):
        feed = {"input_ids": jnp.asarray(
                    rng.integers(0, cfg.vocab_size, (B, 1)).astype(np.int64)),
                "pos": jnp.full((B,), L // 2, dtype=np.int64)}
        shape = (NL, B, H, L, hd) if stacked else (B, H, L, hd)
        kinds = ("key", "value")
        for kind in kinds:
            kv = rng.standard_normal(shape).astype(np.float32)
            name = f"past_{kind}" if stacked else None
            if int8_kv:
                q = jnp.asarray(
                    np.clip(np.round(kv * 32), -127, 127).astype(np.int8))
                s_shape = (NL, H) if stacked else (H,)
                if stacked:
                    feed[f"past_{kind}"] = q
                    feed[f"kv_scale_{kind}"] = jnp.full(s_shape, 1 / 32,
                                                        jnp.float32)
                else:
                    for i in range(NL):
                        feed[f"past_{kind}_{i}"] = q
                        feed[f"kv_scale_{kind}_{i}"] = jnp.full(
                            s_shape, 1 / 32, jnp.float32)
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
            # feed presents back in (the real decode loop does exactly this)
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
            "metric": f"gpt2_decode_{label}",
            "layers": cfg.n_layer, "d_model": cfg.n_embd, "batch": B,
            "cache_len": L,
            "step_ms": round(sec * 1e3, 3),
            "tokens_per_sec": round(B / sec, 1),
        }))
        return sec

    feed_f = make_feed(False)
    feed_q = make_feed(True)
    t_f = bench(g, "fp32", feed_f)
    g4 = quantize_weights_int4(g)
    t_4 = bench(g4, "int4_weights", feed_f)
    g4kv8 = quantize_weights_int4(g_kv8)
    t_48 = bench(g4kv8, "int4_weights_int8_kv", feed_q)
    t_f48 = bench(quantize_weights_int4(g_fused_kv8),
                  "int4_weights_int8_kv_fusedattn", feed_q)
    # int4 KV: nibble-packed [B,H,L,hd/2] cache — half the int8 cache's
    # HBM read volume on the bandwidth-bound decode step
    g_kv4 = import_model(build_gpt2_decode(cfg, batch=B, max_len=L,
                                           kv_dtype="int4"))
    feed_q4 = {"input_ids": feed_f["input_ids"], "pos": feed_f["pos"]}
    for kind in ("key", "value"):
        packed = rng.integers(-128, 128,
                              (B, H, L, hd // 2)).astype(np.int8)
        for i in range(NL):
            feed_q4[f"past_{kind}_{i}"] = jnp.asarray(packed)
            feed_q4[f"kv_scale_{kind}_{i}"] = jnp.full((H,), 1 / 16,
                                                       jnp.float32)
    t_k4 = bench(quantize_weights_int4(g_kv4), "int4_weights_int4_kv",
                 feed_q4)
    # scan-over-layers forms: same math, ONE lax.scan body instead of
    # n_layer inlined blocks -> far fewer HLO ops per step (dispatch-gap fix)
    t_sf = bench(g_scan, "scan_fp32", make_feed(False, stacked=True),
                 stacked=True)
    g_scan48 = quantize_weights_int4(g_scan_kv8)
    t_s48 = bench(g_scan48, "scan_int4_weights_int8_kv",
                  make_feed(True, stacked=True), stacked=True)
    print(json.dumps({"metric": "gpt2_decode_int4_speedup",
                      "value": round(t_f / t_4, 3)}))
    print(json.dumps({"metric": "gpt2_decode_int4_int8kv_speedup",
                      "value": round(t_f / t_48, 3)}))
    print(json.dumps({"metric": "gpt2_decode_int4_int4kv_speedup",
                      "value": round(t_f / t_k4, 3)}))
    print(json.dumps({"metric": "gpt2_decode_fusedattn_speedup",
                      "value": round(t_f / t_f48, 3)}))
    print(json.dumps({"metric": "gpt2_decode_scan_speedup_vs_fp32",
                      "value": round(t_f / t_sf, 3)}))
    print(json.dumps({"metric": "gpt2_decode_scan_int4_int8kv_speedup",
                      "value": round(t_f / t_s48, 3)}))


if __name__ == "__main__":
    main()
