"""Profiling helpers: jax.profiler traces with ONNX-node-name correlation.

Engine lowering wraps every node in jax.named_scope (engine.py), so traces
collected here show HLO ops labeled `<OpType>.<onnx_node_name>` — the
structured replacement for the reference's per-node stdout log
(reference: model_inference.rs:132-135 and the debug_prints cargo feature).
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax

__all__ = ["trace"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Collect a TensorBoard-viewable profiler trace of the enclosed block.

    Usage:
        with profiling.trace("/tmp/tb"):
            engine.run(feed)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
