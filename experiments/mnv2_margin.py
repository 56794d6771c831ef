import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.mobilenet import build_mobilenetv2

rng = np.random.default_rng(7)
graph = import_model(build_mobilenetv2())
x = rng.standard_normal((64,3,128,128)).astype(np.float32)
eng = Engine(graph)
t0 = eng.run({"input": x}).top1()
for eps in (0.001, 0.005, 0.02):
    x2 = x + rng.standard_normal(x.shape).astype(np.float32)*eps
    t1 = eng.run({"input": x2}).top1()
    print(f"fp32 input-noise eps={eps}: top1 flip rate {(t0!=t1).mean():.3f}")
# bf16 engine
engb = Engine(graph, dtype="bfloat16")
tb = engb.run({"input": x}).top1()
print(f"bf16 vs fp32 top1 flip rate: {(t0!=tb).mean():.3f}")
