import sys, pathlib, glob
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.gpt2 import GPT2Config, build_gpt2_decode
from onnx_rusty_inference_engine_tpu.quant import quantize_weights_int4

cfg = GPT2Config(n_positions=256, n_layer=12, n_embd=768, n_head=12)
B, L, H, hd = 8, 256, 12, 64
g = quantize_weights_int4(import_model(build_gpt2_decode(cfg, batch=B, max_len=L, kv_dtype="int8")))
rng=np.random.default_rng(0)
feed = {"input_ids": jnp.asarray(rng.integers(0,cfg.vocab_size,(B,1)).astype(np.int64)),
        "pos": jnp.asarray([L//2],dtype=np.int64)}
for i in range(12):
    for kind in ("key","value"):
        feed[f"past_{kind}_{i}"]=jnp.asarray(rng.integers(-127,127,(B,H,L,hd)),jnp.int8)
        feed[f"kv_scale_{kind}_{i}"]=jnp.full((H,),1/32,jnp.float32)
eng=Engine(g)
out=eng._fn(eng.params,feed); jax.block_until_ready(out)
import shutil; shutil.rmtree("/tmp/tb2",ignore_errors=True)
jax.profiler.start_trace("/tmp/tb2")
for _ in range(20):
    out=eng._fn(eng.params,feed)
jax.block_until_ready(out)
jax.device_get(out["logits"].ravel()[:1])
jax.profiler.stop_trace()

import json
from xprof.convert import raw_to_tool_data as rtd
f=glob.glob("/tmp/tb2/**/*.xplane.pb",recursive=True)
data,_=rtd.xspace_to_tool_data(f,"framework_op_stats",{})
js=json.loads(data) if isinstance(data,(str,bytes)) else data
tbl=js[0]; cols=[c["id"] for c in tbl["cols"]]
rows=[dict(zip(cols,[c["v"] for c in r["c"]])) for r in tbl["rows"]]
dev=[r for r in rows if r["host_or_device"]=="Device" and r["operation"]!="IDLE"]
dev.sort(key=lambda r:-r["total_self_time"])
tot=sum(r["total_self_time"] for r in dev)
print(f"busy {tot/20:.0f} us/step")
for r in dev[:25]:
    print(f"{r['total_self_time']/20:7.1f} us {100*r['total_self_time']/tot:5.1f}% {r['occurrences']:5.0f}x {r['operation'][:95]}")
