import sys, pathlib, glob, json, collections
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models import build_squeezenet
from onnx_rusty_inference_engine_tpu.quant import quantize_graph

batch=int(sys.argv[1]) if len(sys.argv)>1 else 64
rng=np.random.default_rng(0)
x=rng.standard_normal((batch,3,224,224)).astype(np.float32)
graph=import_model(build_squeezenet())
qgraph=quantize_graph(graph,calibration_inputs=[{"data_0":x[:8]}])
eng=Engine(qgraph)
ins=eng._canon_inputs({"data_0":jnp.asarray(x)})
out=eng._fn(eng.params,ins); jax.block_until_ready(out)
import shutil; shutil.rmtree("/tmp/tb",ignore_errors=True)
jax.profiler.start_trace("/tmp/tb")
for _ in range(20):
    out=eng._fn(eng.params,ins)
jax.block_until_ready(out)
jax.device_get(next(iter(out.values())).ravel()[:1])
jax.profiler.stop_trace()
print(glob.glob("/tmp/tb/**/*.xplane.pb",recursive=True))
