"""Headline benchmark: SqueezeNet 1.0 images/sec/chip (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so `vs_baseline` reports
the north-star ratio: INT8 throughput / fp32 throughput on the same chip
(target >= 2.0). Until the INT8 path lands, it falls back to 1.0 (fp32/fp32).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _throughput(engine, feed, steps: int = 30, warmup: int = 3) -> float:
    import jax

    for _ in range(warmup):
        jax.block_until_ready(engine(feed))
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        jax.block_until_ready(engine(feed))
        times.append(time.perf_counter() - t0)
    batch = next(iter(feed.values())).shape[0]
    return batch / float(np.median(times))


def main() -> None:
    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models import build_squeezenet

    batch = 64
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, 3, 224, 224)).astype(np.float32)
    graph = import_model(build_squeezenet())
    feed = {"data_0": x}

    fp32_engine = Engine(graph)
    fp32_ips = _throughput(fp32_engine, feed)

    int8_ips = None
    try:
        from onnx_rusty_inference_engine_tpu.quant import quantize_graph

        qgraph = quantize_graph(graph, calibration_inputs=[feed])
        q_engine = Engine(qgraph)
        int8_ips = _throughput(q_engine, feed)
    except Exception:
        pass

    if int8_ips is not None:
        print(json.dumps({
            "metric": "squeezenet1.0_int8_images_per_sec_per_chip_b64",
            "value": round(int8_ips, 2),
            "unit": "images/s/chip",
            "vs_baseline": round(int8_ips / fp32_ips, 3),
        }))
    else:
        print(json.dumps({
            "metric": "squeezenet1.0_fp32_images_per_sec_per_chip_b64",
            "value": round(fp32_ips, 2),
            "unit": "images/s/chip",
            "vs_baseline": 1.0,
        }))


if __name__ == "__main__":
    main()
