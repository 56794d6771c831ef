"""Test env: force an 8-virtual-device CPU platform BEFORE jax imports.

Multi-chip sharding tests run the same pjit code path as a real TPU slice
(SURVEY.md §4 implication (d)); CPU also avoids contending for the single
tunneled TPU chip during development.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize imports jax at interpreter start (before this
# file), so the env var alone may not bind — force the platform via config
# too (backend resolution is lazy, so this still takes effect).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"

# Smoke tier: `python -m pytest tests/ -m "not slow" -q` (~5 min) for the
# development inner loop; the full suite (~17 min solo) before committing
# serving/parallel changes. Files listed here hold the long-running
# integration tests (serving loops, multi-process meshes, model-zoo
# end-to-end, quantized CNN agreement sweeps) — each >30 s of the suite.
_SLOW_FILES = {
    "test_parallel.py", "test_serve_llm.py", "test_distributed.py",
    "test_moe.py", "test_server_sampling.py", "test_chunked_multi.py",
    "test_resnet.py", "test_mobilenet.py", "test_speculative.py",
    "test_spec_server.py", "test_device_loop.py", "test_quant.py",
    "test_lora.py", "test_beam.py", "test_server_lifecycle.py",
    "test_len_buckets.py", "test_http_serve.py", "test_prefix_cache.py",
    "test_int4_kv.py", "test_pipeline.py", "test_scan_decode.py",
    "test_bench_supervisor.py", "test_e2e_golden.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.path is not None and item.path.name in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def mnist_model_path():
    return f"{REFERENCE}/models/mnist-8.onnx"


@pytest.fixture(scope="session")
def mnist_golden():
    from onnx_rusty_inference_engine_tpu import onnx_io

    x = onnx_io.read_tensor_file(f"{REFERENCE}/mnist_data_0.pb")
    y = onnx_io.read_tensor_file(f"{REFERENCE}/mnist_output_0.pb")
    return x, y


@pytest.fixture(scope="session")
def squeezenet_golden():
    from onnx_rusty_inference_engine_tpu import onnx_io

    x = onnx_io.read_tensor_file(f"{REFERENCE}/squeezenet_data_0.pb")
    y = onnx_io.read_tensor_file(f"{REFERENCE}/squeezenet_output_0.pb")
    return x, y
