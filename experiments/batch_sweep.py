"""SqueezeNet INT8 throughput vs batch (VERDICT #5 lever c: bigger batch
amortizes inter-op gaps on the time-shared chip)."""
import sys, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models import build_squeezenet
from onnx_rusty_inference_engine_tpu.quant import quantize_graph
from onnx_rusty_inference_engine_tpu.utils.timing import engine_throughput

rng = np.random.default_rng(0)
graph = import_model(build_squeezenet())
calib = rng.standard_normal((8, 3, 224, 224)).astype(np.float32)
qgraph = quantize_graph(graph, calibration_inputs=[{"data_0": calib}])
for batch in (64, 128, 256):
    x = rng.standard_normal((batch, 3, 224, 224)).astype(np.float32)
    ips = engine_throughput(Engine(qgraph), {"data_0": x}, iters=50)
    print(json.dumps({"batch": batch, "int8_img_per_s": round(ips, 1)}))
