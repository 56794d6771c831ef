"""KV-cache length economics: what does a longer max_len cost the
HBM-bound decode step when the LIVE sequences are short? (VERDICT r3 #5)

Every decode step attends the full max_len cache regardless of live
lengths, so the cache length sets the K/V HBM traffic:
    bytes/step ~ B * H * max_len * hd * 2 (K+V) * dtype
Chained on-device timing (utils/timing.py) of the north-star GPT-2
decode step at max_len in {128, 256, 512, 1024}, fp32 and int8 KV.
The curve quantifies the dead-cache tax and decides the mitigation
(cache-length buckets per slot-pool generation vs block-paged KV).

Usage (real chip): python experiments/kv_len_probe.py [--layers 12 --d 768]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.gpt2 import (
    GPT2Config, build_gpt2_decode)
from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer


def step_seconds(cfg, batch: int, max_len: int, kv_dtype: str,
                 iters: int = 200) -> float:
    g = import_model(build_gpt2_decode(cfg, batch=batch, max_len=max_len,
                                       kv_dtype=kv_dtype))
    eng = Engine(g)
    rng = np.random.default_rng(0)
    H, hd = cfg.n_head, cfg.n_embd // cfg.n_head
    feed = {"input_ids": jnp.asarray(
                rng.integers(0, cfg.vocab_size, (batch, 1)), jnp.int32),
            "pos": jnp.full((batch,), max_len // 2, jnp.int32)}
    for i in range(cfg.n_layer):
        for kind in ("key", "value"):
            if kv_dtype == "int8":
                feed[f"past_{kind}_{i}"] = jnp.asarray(rng.integers(
                    -90, 90, (batch, H, max_len, hd)), jnp.int8)
                feed[f"kv_scale_{kind}_{i}"] = jnp.full((H,), 0.02,
                                                        jnp.float32)
            elif kv_dtype == "int4":  # nibble-packed: two values/byte
                feed[f"past_{kind}_{i}"] = jnp.asarray(rng.integers(
                    -128, 128, (batch, H, max_len, hd // 2)), jnp.int8)
                feed[f"kv_scale_{kind}_{i}"] = jnp.full((H,), 0.3,
                                                        jnp.float32)
            else:
                feed[f"past_{kind}_{i}"] = jnp.asarray(
                    rng.standard_normal((batch, H, max_len, hd)) * 0.3,
                    jnp.float32)
    present_of = {f"past_{kind}_{i}": f"present_{kind}_{i}"
                  for i in range(cfg.n_layer) for kind in ("key", "value")}
    fn = eng.jitted

    def step(params, carry):
        out = fn(params, carry)
        new = dict(carry)
        for p, pr in present_of.items():
            new[p] = out[pr]
        # serialize via a data dependency on the logits
        dep = jnp.sum(out["logits"].ravel()[:1]) * 0
        new["pos"] = carry["pos"] + dep.astype(carry["pos"].dtype)
        return new

    return device_loop_timer(step, feed, iters, params=eng.params)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--vocab", type=int, default=50257)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lens", default="128,256,512,1024")
    ap.add_argument("--kv", default="float32,int8")
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    cfg = GPT2Config(vocab_size=args.vocab, n_positions=2048,
                     n_embd=args.d, n_layer=args.layers,
                     n_head=args.heads)
    rows = []
    for kv in args.kv.split(","):
        for L in (int(x) for x in args.lens.split(",")):
            sec = step_seconds(cfg, args.batch, L, kv, args.iters)
            row = {"kv": kv, "max_len": L, "step_ms": round(sec * 1e3, 4),
                   "tok_s": round(args.batch / sec, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)
    base = {r["kv"]: r["step_ms"] for r in rows if r["max_len"] == 128}
    for r in rows:
        if r["kv"] in base:
            r["vs_128"] = round(r["step_ms"] / base[r["kv"]], 3)
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
