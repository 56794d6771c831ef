import sys, pathlib, collections
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
comp = eng._fn.lower(eng.params, ins).compile()
txt = comp.as_text()
open("/tmp/sq_int8_hlo.txt","w").write(txt)
ops = collections.Counter()
for line in txt.splitlines():
    line=line.strip()
    if "=" in line and not line.startswith(("HloModule","ENTRY","}","ROOT %","//")):
        rhs = line.split("=",1)[1].strip()
        # opcode is token after dtype shape
        import re
        m = re.match(r"[a-z0-9_\[\],{}\s/]*?\b([a-z][a-z0-9-]*)\(", rhs)
        if m: ops[m.group(1)] += 1
print(ops.most_common(20))
print("lines:", len(txt.splitlines()))
