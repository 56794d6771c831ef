"""Roofline probe: cost_analysis of the compiled int8 SqueezeNet step."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models import build_squeezenet
from onnx_rusty_inference_engine_tpu.quant import quantize_graph

batch = 64
rng = np.random.default_rng(0)
x = rng.standard_normal((batch, 3, 224, 224)).astype(np.float32)
graph = import_model(build_squeezenet())
qgraph = quantize_graph(graph, calibration_inputs=[{"data_0": x[:8]}])
eng = Engine(qgraph)
ins = eng._canon_inputs({"data_0": jnp.asarray(x)})
lowered = eng._fn.lower(eng.params, ins)
comp = lowered.compile()
ca = comp.cost_analysis()
if isinstance(ca, list): ca = ca[0]
flops = ca.get("flops"); bytes_ = ca.get("bytes accessed")
print("flops:", flops, " bytes:", bytes_)
# time per step at 20629 img/s b64:
t = 64/20629.15
print(f"step time {t*1e3:.3f} ms -> {flops/t/1e12:.1f} TOP/s, {bytes_/t/1e9:.1f} GB/s")
for k in sorted(ca):
    if k.startswith("bytes accessed") and ca[k] > 1e6:
        print(f"  {k}: {ca[k]/1e6:.1f} MB")
