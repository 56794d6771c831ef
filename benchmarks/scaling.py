"""Scaling-efficiency benchmark: images/s vs mesh size (north star: >= 85%).

On real multi-chip hardware this measures true scaling; in this environment
(one tunneled chip) it runs the identical pjit code path over N virtual CPU
devices to validate the sharding + collectives story, and reports 1-chip
TPU throughput as the per-chip baseline.

Run: python benchmarks/scaling.py [--devices 1 2 4 8] [--cpu]
Prints one JSON line per mesh size.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))



import argparse
import json
import sys

import numpy as np


def measure(n_devices: int, batch_per_device: int = 32, int8: bool = True,
            iters: int = 100) -> dict:
    import jax
    import jax.numpy as jnp

    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models import build_squeezenet
    from onnx_rusty_inference_engine_tpu.parallel import (
        cnn_param_sharding,
        data_input_sharding,
        make_mesh,
    )
    from onnx_rusty_inference_engine_tpu.quant import quantize_graph
    from onnx_rusty_inference_engine_tpu.utils.timing import engine_throughput

    graph = import_model(build_squeezenet())
    rng = np.random.default_rng(0)
    calib = rng.standard_normal((8, 3, 224, 224)).astype(np.float32)
    if int8:
        graph = quantize_graph(graph, calibration_inputs=[{"data_0": calib}])

    batch = batch_per_device * n_devices
    x = rng.standard_normal((batch, 3, 224, 224)).astype(np.float32)

    if n_devices == 1:
        eng = Engine(graph)
        ips = engine_throughput(eng, {"data_0": x}, iters=iters)
        return {"devices": 1, "batch": batch, "images_per_sec": round(ips, 1)}

    mesh = make_mesh({"data": n_devices, "model": 1})
    eng = Engine(graph, mesh=mesh,
                 param_sharding_fn=cnn_param_sharding(mesh),
                 input_sharding_fn=data_input_sharding(mesh))
    with mesh:
        ips = engine_throughput(eng, {"data_0": x}, iters=iters)
    return {"devices": n_devices, "batch": batch,
            "images_per_sec": round(ips, 1)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--batch-per-device", type=int, default=32)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual-CPU mesh (code-path validation)")
    args = p.parse_args()

    if args.cpu:
        n = max(args.devices)
        flags = _os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            _os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}").strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    elif max(args.devices) > len(jax.devices()):
        jax.config.update("jax_platforms", "cpu")

    results = []
    base = None
    for n in args.devices:
        if n > len(jax.devices()):
            print(json.dumps({"devices": n, "skipped": "not enough devices"}))
            continue
        r = measure(n, args.batch_per_device, int8=not args.fp32,
                    iters=args.iters)
        if base is None:
            base = r["images_per_sec"] / r["devices"]
        r["scaling_efficiency"] = round(
            r["images_per_sec"] / (base * r["devices"]), 3)
        results.append(r)
        print(json.dumps(r))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
