"""Headline benchmark: SqueezeNet 1.0 INT8 images/sec/chip (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so `vs_baseline` reports
the north-star ratio: INT8 throughput / fp32 throughput on the same chip
(target >= 2.0). Measurement is device-resident and chained on-device
(utils/timing.py) so tunnel dispatch and H2D don't pollute the number.
"""

from __future__ import annotations

import json

import numpy as np


def main() -> None:
    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models import build_squeezenet
    from onnx_rusty_inference_engine_tpu.utils.timing import engine_throughput

    # batch 256: the per-kernel gaps on the time-shared chip are a fixed
    # per-step cost, so larger batches amortize them (b64 ~18-21k img/s,
    # b128 ~33k, b256 ~36k — experiments/batch_sweep.py); serving batches
    # this size are routine for offline/throughput-oriented inference
    batch = 256
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, 3, 224, 224)).astype(np.float32)
    graph = import_model(build_squeezenet())
    feed = {"data_0": x}

    fp32_ips = engine_throughput(Engine(graph), feed)

    int8_ips = None
    try:
        from onnx_rusty_inference_engine_tpu.quant import quantize_graph

        qgraph = quantize_graph(graph, calibration_inputs=[{"data_0": x[:8]}])
        int8_ips = engine_throughput(Engine(qgraph), feed)
    except Exception:
        pass

    if int8_ips is not None:
        print(json.dumps({
            "metric": f"squeezenet1.0_int8_images_per_sec_per_chip_b{batch}",
            "value": round(int8_ips, 2),
            "unit": "images/s/chip",
            "vs_baseline": round(int8_ips / fp32_ips, 3),
        }))
    else:
        print(json.dumps({
            "metric": f"squeezenet1.0_fp32_images_per_sec_per_chip_b{batch}",
            "value": round(fp32_ips, 2),
            "unit": "images/s/chip",
            "vs_baseline": 1.0,
        }))


if __name__ == "__main__":
    main()
