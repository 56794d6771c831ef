"""INT8 accuracy delta: top-1 agreement between the fp32 and the quantized
engine (north star: top-1 delta <= 0.5%).

No labeled dataset ships offline, so the fp32 model's own predictions are
the ground truth and the metric is top-1 DISAGREEMENT of the INT8 engine
on held-out inputs (inputs not used for calibration) — the standard
label-free PTQ fidelity measure, and a strictly harsher bound than the
accuracy delta on a real dataset (every disagreement costs accuracy at most
once, and only when fp32 was right).

Run: python benchmarks/accuracy.py [--model squeezenet|resnet50|mobilenetv2]
     [--batches 8 --batch 32] [--cpu]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np

_BUILDERS = {
    "squeezenet": ("data_0", (3, 224, 224),
                   lambda: __import__(
                       "onnx_rusty_inference_engine_tpu.models.squeezenet",
                       fromlist=["build_squeezenet"]).build_squeezenet()),
    "resnet50": ("data", (3, 128, 128),
                 lambda: __import__(
                     "onnx_rusty_inference_engine_tpu.models.resnet",
                     fromlist=["build_resnet50"]).build_resnet50()),
    "mobilenetv2": ("input", (3, 128, 128),
                    lambda: __import__(
                        "onnx_rusty_inference_engine_tpu.models.mobilenet",
                        fromlist=["build_mobilenetv2"]).build_mobilenetv2()),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="squeezenet", choices=sorted(_BUILDERS))
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.quant import (QuantConfig,
                                                       quantize_graph)

    input_name, shape, build = _BUILDERS[args.model]
    graph = import_model(build())

    rng = np.random.default_rng(7)
    calib = rng.standard_normal((8,) + shape).astype(np.float32)
    engines = {
        method: Engine(quantize_graph(
            graph, calibration_inputs=[{input_name: calib}],
            config=QuantConfig(calibration=method)))
        for method in ("minmax", "percentile", "mse")
    }

    eng_f = Engine(graph)
    # bf16 flip rate = the model's intrinsic top-1 conditioning floor: on
    # synthetic (random) weights some families have near-uniform logits, so
    # ANY perturbation flips top-1 — compare int8 against that floor, not
    # against zero.
    eng_b = Engine(graph, dtype="bfloat16")
    agree = {m: 0 for m in engines}
    agree_b = total = 0
    for _ in range(args.batches):
        x = rng.standard_normal((args.batch,) + shape).astype(np.float32)
        top_f = eng_f.run({input_name: x}).top1()
        agree_b += int((top_f == eng_b.run({input_name: x}).top1()).sum())
        for m, eng in engines.items():
            agree[m] += int((top_f == eng.run({input_name: x}).top1()).sum())
        total += args.batch
    for m in engines:
        print(json.dumps({
            "metric": f"{args.model}_int8_top1_disagreement",
            "calibration": m,
            "value": round(1.0 - agree[m] / total, 4),
            "bf16_floor": round(1.0 - agree_b / total, 4),
            "unit": "fraction",
            "n": total,
            "target": "<= 0.005 (+ floor)",
        }))


if __name__ == "__main__":
    main()
