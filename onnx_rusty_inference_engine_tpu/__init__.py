"""TPU-native ONNX inference framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the Rust
reference `jackperlo/onnx-rusty-inference-engine` (see SURVEY.md): ONNX
protobuf ingestion, a typed graph IR with import-time passes, lowering to a
single jit/pjit-compiled XLA program, fused INT8 Pallas kernels, mesh
sharding for multi-chip/multi-host scale-out, and a batched serving loop.
"""

from . import onnx_io
from .graph import Graph, import_model, import_onnx
from .engine import Engine, InferenceResult, lower
from .api import onnx_make_inference

__version__ = "0.1.0"

__all__ = [
    "onnx_io",
    "Graph",
    "import_model",
    "import_onnx",
    "Engine",
    "InferenceResult",
    "lower",
    "onnx_make_inference",
]
