import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from onnx_rusty_inference_engine_tpu.engine import Engine, lower
from onnx_rusty_inference_engine_tpu.graph import import_model, Graph
from onnx_rusty_inference_engine_tpu.models.mobilenet import build_mobilenetv2
from onnx_rusty_inference_engine_tpu import quant

rng = np.random.default_rng(7)
graph = import_model(build_mobilenetv2())
calib = rng.standard_normal((8,3,128,128)).astype(np.float32)
x = rng.standard_normal((64,3,128,128)).astype(np.float32)
ref = Engine(graph).run({"input": x}); reft = ref.top1()

ranges_max = quant.calibrate(graph, [{"input": calib}])

# percentile variant: reuse probe machinery by monkeypatching? compute directly
import jax
names=[s.name for s in graph.inputs]+[o for n in graph.nodes for o in n.outputs if o]
seen=set(graph.constants); names=[n for n in dict.fromkeys(names) if n not in seen]
probe = Graph(name=graph.name, nodes=graph.nodes, constants=graph.constants,
              inputs=graph.inputs, outputs=names, opset=graph.opset,
              weight_names=graph.weight_names)
fn = jax.jit(lower(probe))
params = {k: jnp.asarray(graph.constants[k]) for k in graph.weight_names}
out = fn(params, {"input": jnp.asarray(calib)})
for pct in (99.99, 99.9, 99.5, 99.0):
    ranges_p = {}
    for name, val in out.items():
        v = np.asarray(val)
        if not np.issubdtype(v.dtype, np.floating): continue
        a = float(np.percentile(np.abs(v), pct))
        ranges_p[name] = (-a, a)
    q = quant.quantize_graph(graph, ranges=ranges_p)
    got = Engine(q).run({"input": x})
    d = 1.0 - (got.top1() == reft).mean()
    err = np.abs(got["output"]-ref["output"]).max()
    print(f"pct={pct}: disagree={d:.3f} max_prob_err={err:.4f}")
