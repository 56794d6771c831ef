"""Whole-graph A/B for the fire-expand fusion (VERDICT r4 #5 attack).

The isolated-pair probe (fire_fuse_probe.py) hit a fixed ~870us/step
chained-loop floor on every shape — uninformative. This is the real
test: transform the SqueezeNet fp32 graph so each fire module's
expand1x1 + expand3x3 + two Relus + Concat become ONE 3x3 conv (1x1
filters zero-padded to the center tap) + ONE Relu, quantize both graphs
identically, and compare whole-graph INT8 throughput at b256.

Exactness: zero taps contribute exact zeros in fp32; per-out-channel
weight scales are unchanged by zero padding, and the quantizer already
unifies Concat input scales to their max, which is exactly the fused
conv's single output scale — so the int8 outputs should agree to the
last requant rounding. Asserted.

Run (real chip): python experiments/fire_fuse_graph.py [batch]
"""

import sys, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import Graph, Node, import_model
from onnx_rusty_inference_engine_tpu.models import build_squeezenet
from onnx_rusty_inference_engine_tpu.quant import quantize_graph
from onnx_rusty_inference_engine_tpu.utils.timing import engine_throughput


def fuse_fire_expand(g: Graph) -> Graph:
    prod = g.producers()
    consts = dict(g.constants)
    drop = set()
    new_nodes = []
    fused = 0

    def conv_of(relu_out):
        r = prod.get(relu_out)
        if r is None or r.op_type != "Relu":
            return None
        c = prod.get(r.inputs[0])
        if c is None or c.op_type != "Conv":
            return None
        if any(int(s) != 1 for s in c.attr("strides", [1, 1])):
            return None
        if int(c.attr("group", 1)) != 1:
            return None
        return r, c

    for n in g.nodes:
        if n.op_type != "Concat" or len(n.inputs) != 2 \
                or int(n.attr("axis", 0)) != 1:
            continue
        a, b_ = conv_of(n.inputs[0]), conv_of(n.inputs[1])
        if not a or not b_:
            continue
        (r1, c1), (r3, c3) = a, b_
        if c1.inputs[0] != c3.inputs[0]:
            continue
        k1 = [int(x) for x in c1.attr("kernel_shape", [0, 0])]
        k3 = [int(x) for x in c3.attr("kernel_shape", [0, 0])]
        p3 = [int(x) for x in c3.attr("pads", [0, 0, 0, 0])]
        if k1 != [1, 1] or k3 != [3, 3] or p3 != [1, 1, 1, 1]:
            continue
        if any(int(x) for x in c1.attr("pads", [0, 0, 0, 0])):
            continue
        w1, w3 = consts[c1.inputs[1]], consts[c3.inputs[1]]
        w1f = np.zeros(w1.shape[:2] + (3, 3), w1.dtype)
        w1f[:, :, 1, 1] = w1[:, :, 0, 0]
        wf = np.concatenate([w1f, w3], axis=0)
        bf_name = ""
        if len(c1.inputs) > 2 and c1.inputs[2] and len(c3.inputs) > 2 \
                and c3.inputs[2]:
            bf = np.concatenate([consts[c1.inputs[2]],
                                 consts[c3.inputs[2]]], axis=0)
            bf_name = f"{n.outputs[0]}__fusedb"
            consts[bf_name] = bf
        wf_name = f"{n.outputs[0]}__fusedw"
        consts[wf_name] = wf
        conv_out = f"{n.outputs[0]}__fusedconv"
        ins = [c1.inputs[0], wf_name] + ([bf_name] if bf_name else [])
        new_nodes.append((n, [
            Node("Conv", ins, [conv_out], name=f"{n.outputs[0]}_fused",
                 attrs={"kernel_shape": [3, 3], "pads": [1, 1, 1, 1],
                        "strides": [1, 1]}),
            Node("Relu", [conv_out], [n.outputs[0]],
                 name=f"{n.outputs[0]}_fusedrelu"),
        ]))
        drop.update(id(x) for x in (c1, r1, c3, r3, n))
        fused += 1

    repl = {id(n): reps for n, reps in new_nodes}
    nodes = []
    for n in g.nodes:
        if id(n) in repl:
            nodes.extend(repl[id(n)])
        elif id(n) not in drop:
            nodes.append(n)
    print(json.dumps({"note": "fused fire expand pairs", "count": fused}))
    used = {i for n in nodes for i in n.inputs if i}
    consts = {k: v for k, v in consts.items() if k in used}
    weight_names = ([w for w in g.weight_names if w in consts]
                    + [k for k in consts if k not in g.constants])
    return Graph(g.name, nodes, consts, g.inputs, g.outputs, g.opset,
                 dict(g.opsets), weight_names)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, 3, 224, 224)).astype(np.float32)
    calib = [{"data_0": x[:8]}]

    g = import_model(build_squeezenet())
    gf = fuse_fire_expand(g)
    q_base = quantize_graph(g, calibration_inputs=calib)
    q_fuse = quantize_graph(gf, calibration_inputs=calib)

    e_base, e_fuse = Engine(q_base), Engine(q_fuse)
    out_a = np.asarray(next(iter(e_base({"data_0": x[:16]}).values())))
    out_b = np.asarray(next(iter(e_fuse({"data_0": x[:16]}).values())))
    top_match = float((out_a.reshape(16, -1).argmax(1)
                       == out_b.reshape(16, -1).argmax(1)).mean())
    max_err = float(np.max(np.abs(out_a - out_b)))

    ips_base = engine_throughput(e_base, {"data_0": x}, iters=60)
    ips_fuse = engine_throughput(e_fuse, {"data_0": x}, iters=60)
    print(json.dumps({
        "batch": B, "int8_base_img_s": round(ips_base, 1),
        "int8_fused_img_s": round(ips_fuse, 1),
        "speedup": round(ips_fuse / ips_base, 4),
        "top1_agreement": top_match, "max_abs_err": max_err,
    }), flush=True)


if __name__ == "__main__":
    main()
