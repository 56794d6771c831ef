import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.mobilenet import build_mobilenetv2
from onnx_rusty_inference_engine_tpu import quant

rng = np.random.default_rng(7)
graph = import_model(build_mobilenetv2())
calib = rng.standard_normal((8,3,128,128)).astype(np.float32)
x = rng.standard_normal((64,3,128,128)).astype(np.float32)
ref = Engine(graph).run({"input": x}); reft = ref.top1()

# hack: exclude depthwise by making quantize skip group>1 — monkeypatch
orig_loop = quant.quantize_graph
import copy
RANGES = quant.calibrate(graph, [{"input": calib}])
def measure(tag, graph2=None, skip_pred=None):
    g = graph
    if skip_pred:
        g = copy.deepcopy(graph)
        for n in g.nodes:
            if skip_pred(n):
                n.op_type = "___Conv"  # hide from quantize_ops
        q = quant.quantize_graph(g, ranges=RANGES)
        for n in q.nodes:
            if n.op_type == "___Conv":
                n.op_type = "Conv"
    else:
        q = quant.quantize_graph(g, ranges=RANGES)
    got = Engine(q).run({"input": x})
    d = 1.0 - (got.top1() == reft).mean()
    err = np.abs(got["output"]-ref["output"]).max()
    nq = sum(1 for n in q.nodes if n.op_type.startswith("QLinear"))
    print(f"{tag}: disagree={d:.3f} max_prob_err={err:.4f} qlinear={nq}")

measure("all-int8")
measure("dw-fp32", skip_pred=lambda n: n.op_type=="Conv" and int(n.attr("group",1))>1)
measure("dw+project-fp32", skip_pred=lambda n: n.op_type=="Conv" and (int(n.attr("group",1))>1 or "project" in (n.name or "")))
measure("first-last-fp32", skip_pred=lambda n: n.op_type=="Conv" and (("stem" in (n.name or n.outputs[0])) or ("head" in (n.name or n.outputs[0]))))
