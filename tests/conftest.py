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
