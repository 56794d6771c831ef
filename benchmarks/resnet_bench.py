"""ResNet-50 INT8 throughput (north-star config #3): chained on-device
images/s/chip, batch-swept, fp32 vs INT8 — same measurement discipline as
the SqueezeNet headline (utils/timing.py; per-dispatch timing is
meaningless on the tunneled chip, PERF.md).

Run: python benchmarks/resnet_bench.py [--batches 64,128] [--steps 30]
Prints one JSON line per (batch, dtype).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--fp32", action="store_true",
                    help="also measure fp32 (slower to compile+run)")
    args = ap.parse_args()

    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models import build_resnet50
    from onnx_rusty_inference_engine_tpu.quant import quantize_graph
    from onnx_rusty_inference_engine_tpu.utils.timing import (
        engine_throughput,
    )

    graph = import_model(build_resnet50())
    rng = np.random.default_rng(0)
    in_name = graph.input_names[0]
    calib = rng.standard_normal((8, 3, 224, 224)).astype(np.float32)
    qgraph = quantize_graph(graph, calibration_inputs=[{in_name: calib}])

    for b in [int(x) for x in args.batches.split(",")]:
        x = rng.standard_normal((b, 3, 224, 224)).astype(np.float32)
        feed = {in_name: x}
        row = {"bench": "resnet50", "batch": b}
        if args.fp32:
            row["fp32_images_per_s"] = round(
                engine_throughput(Engine(graph), feed, iters=args.steps), 1)
        row["int8_images_per_s"] = round(
            engine_throughput(Engine(qgraph), feed, iters=args.steps), 1)
        if "fp32_images_per_s" in row and row["fp32_images_per_s"]:
            row["int8_vs_fp32"] = round(
                row["int8_images_per_s"] / row["fp32_images_per_s"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
