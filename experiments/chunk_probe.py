"""Chunk-decode step cost vs chunk size (speculative-decoding economics):
if a chunk-k step costs ~1x a single-token step, verify is nearly free
and speculation pays whenever the draft is cheaper than the target."""
import sys, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax.numpy as jnp
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.gpt2 import GPT2Config, build_gpt2_decode
from onnx_rusty_inference_engine_tpu.quant import quantize_weights_int4
from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer

cfg = GPT2Config(n_positions=256, n_layer=12, n_embd=768, n_head=12)
B, L, H, hd = 8, 256, 12, 64
rng = np.random.default_rng(0)
base = None
for K in (1, 4, 8):
    g = quantize_weights_int4(import_model(build_gpt2_decode(
        cfg, batch=B, max_len=L, kv_dtype="int8", chunk=K)))
    eng = Engine(g)
    feed = {"input_ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (B, K)).astype(np.int64)),
            "pos": jnp.full((B,), L // 2, dtype=jnp.int64)}
    for i in range(12):
        for kind in ("key", "value"):
            feed[f"past_{kind}_{i}"] = jnp.asarray(rng.integers(-127, 127, (B, H, L, hd)), jnp.int8)
            feed[f"kv_scale_{kind}_{i}"] = jnp.full((H,), 1/32, jnp.float32)

    def step(params, carry, eng=eng, K=K):
        out = eng._fn(params, carry)
        new = dict(carry)
        for i in range(12):
            for kind in ("key", "value"):
                new[f"past_{kind}_{i}"] = out[f"present_{kind}_{i}"]
        tok = jnp.argmax(out["logits"], axis=-1)  # [B,K]
        new["input_ids"] = tok.astype(jnp.int64)
        return new

    sec = device_loop_timer(step, feed, iters=50, params=eng.params)
    if K == 1:
        base = sec
    print(json.dumps({"chunk": K, "step_ms": round(sec*1e3, 3),
                      "vs_chunk1": round(sec/base, 2),
                      "tokens_per_step": B*K}))
