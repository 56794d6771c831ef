"""Does the batch-amortization curve keep paying past b256? (VERDICT r4
#5: headline runs b256 on the strength of a b64->b256 sweep; nobody
checked b512/b1024.) Chained on-device throughput for SqueezeNet INT8 at
each batch; also prints the implied marginal cost of the added images.

Run (real chip): python experiments/batch_probe.py [256 512 1024]
"""

import sys, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models import build_squeezenet
from onnx_rusty_inference_engine_tpu.quant import quantize_graph
from onnx_rusty_inference_engine_tpu.utils.timing import engine_throughput

batches = [int(a) for a in sys.argv[1:]] or [256, 512, 1024]
rng = np.random.default_rng(0)
calib = rng.standard_normal((8, 3, 224, 224)).astype(np.float32)
graph = import_model(build_squeezenet())
qgraph = quantize_graph(graph, calibration_inputs=[{"data_0": calib}])

prev = None
for b in batches:
    x = rng.standard_normal((b, 3, 224, 224)).astype(np.float32)
    ips = engine_throughput(Engine(qgraph), {"data_0": x}, iters=50)
    row = {"batch": b, "img_per_s": round(ips, 1),
           "step_ms": round(b / ips * 1e3, 3)}
    if prev is not None:
        db, dt = b - prev["batch"], b / ips - prev["batch"] / (
            prev["img_per_s"])
        row["marginal_us_per_img"] = round(dt / db * 1e6, 2)
    prev = row
    print(json.dumps(row), flush=True)
