"""Ahead-of-time export: a compiled graph as a self-contained artifact.

The reference re-parses its ONNX file and re-walks the node list on every
process start (reference: src/main.rs:26-43 → model_inference.rs:29-120);
its only "artifact" is the .onnx itself. Here the deployment story is
TPU-native AOT: the whole lowered graph — already ONE jitted pure
`f(params, inputs)` (engine.py) — is captured with `jax.export` as
version-stable serialized StableHLO and bundled with its weights into a
single `.npz`:

    p:{name}        weight arrays (any dtype: fp32/bf16/int8/packed int4)
    __stablehlo__   jax.export bytes (StableHLO + calling convention)
    __meta__        JSON: input/output names, shapes, dtypes, platforms

Loading (`load_exported`) needs NO ONNX importer, NO op registry, and NO
tracing — the program is handed straight to the runtime compiler, which on
a serving fleet means cold-start = one XLA compile of a fixed program (and
zero with a persistent compile cache), with no Python graph-build in the
path. `platforms=["cpu", "tpu"]` bakes lowerings for both so one artifact
serves the chip and a CPU fallback host.

This is the "quantize once, deploy the artifact" companion to the QLinear
ONNX re-export (quant.py): that one round-trips through ONNX for
interchange, this one freezes the exact compiled program for serving.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .engine import Engine
from .graph import Graph

__all__ = ["export_engine", "ExportedModel", "load_exported"]

_FORMAT = "oriet-aot-v1"


def export_engine(engine: Engine, example_inputs: Dict[str, np.ndarray],
                  out_path: str,
                  platforms: Optional[Sequence[str]] = None) -> None:
    """Serialize `engine`'s compiled program + weights to `out_path`.

    example_inputs fixes the (static) input shapes/dtypes the artifact
    accepts — same contract as the jit itself. platforms defaults to the
    current backend; pass e.g. ["cpu", "tpu"] for a dual-target artifact.
    """
    from jax import export as jexport

    inputs = engine._canon_inputs(example_inputs)
    kw = {"platforms": list(platforms)} if platforms else {}
    exp = jexport.export(engine._fn, **kw)(engine.params, inputs)
    # bfloat16 has no native numpy container; store a uint16 view + tag
    bf16_params = [k for k, v in engine.params.items()
                   if v.dtype == jnp.bfloat16]
    meta = {
        "format": _FORMAT,
        "platforms": list(exp.platforms),
        "nr_devices": int(getattr(exp, "nr_devices", 1)),
        "inputs": {k: {"shape": list(np.shape(v)),
                       "dtype": str(np.asarray(v).dtype)}
                   for k, v in inputs.items()},
        "outputs": list(engine.graph.outputs),
        "graph_name": engine.graph.name,
        "bf16_params": bf16_params,
    }
    payload = {
        f"p:{k}": (np.asarray(v).view(np.uint16) if k in bf16_params
                   else np.asarray(v))
        for k, v in engine.params.items()
    }
    payload["__stablehlo__"] = np.frombuffer(exp.serialize(), dtype=np.uint8)
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    with open(out_path, "wb") as f:
        np.savez(f, **payload)


def export_graph(graph: Graph, example_inputs: Dict[str, np.ndarray],
                 out_path: str, *, dtype: str = "float32",
                 platforms: Optional[Sequence[str]] = None) -> None:
    """Convenience: build a (single-device) Engine and export it."""
    export_engine(Engine(graph, dtype=dtype), example_inputs, out_path,
                  platforms=platforms)


class ExportedModel:
    """A loaded AOT artifact: callable like an Engine, importer-free.

    Artifacts exported from a sharded Engine record their device count
    (`nr_devices`); calling one places params/inputs on that many local
    devices first (the baked-in shardings then apply inside the program).
    """

    def __init__(self, exported, params: Dict[str, jax.Array], meta: dict):
        self._exported = exported
        self.params = params
        self.meta = meta
        self.input_specs = meta["inputs"]
        self.outputs: List[str] = meta["outputs"]
        self.platforms = meta["platforms"]
        self.nr_devices = int(meta.get("nr_devices", 1))
        self._sharding = None

    def _placed(self, tree):
        if self.nr_devices <= 1:
            return tree
        if self._sharding is None:
            devs = jax.devices()
            if len(devs) < self.nr_devices:
                raise ValueError(
                    f"artifact was exported for {self.nr_devices} devices; "
                    f"only {len(devs)} available")
            from jax.sharding import (Mesh, NamedSharding,
                                      PartitionSpec as P)

            mesh = Mesh(np.asarray(devs[: self.nr_devices]), ("_aot",))
            self._sharding = NamedSharding(mesh, P())
        return {k: jax.device_put(v, self._sharding)
                for k, v in tree.items()}

    def __call__(self, inputs: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        feed = {k: jnp.asarray(v) for k, v in inputs.items()}
        missing = set(self.input_specs) - set(feed)
        if missing:
            raise ValueError(f"missing inputs: {sorted(missing)}")
        return self._exported.call(self._placed(self.params),
                                   self._placed(feed))

    def run(self, inputs) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v) for k, v in self(inputs).items()}


def load_exported(path: str) -> ExportedModel:
    """Load an artifact written by `export_engine`. No ONNX parsing, no op
    registry, no retracing — deserialize and call."""
    from jax import export as jexport

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        if meta.get("format") != _FORMAT:
            raise ValueError(
                f"{path}: not an oriet AOT artifact (format="
                f"{meta.get('format')!r})")
        exported = jexport.deserialize(bytes(z["__stablehlo__"]))
        bf16 = set(meta.get("bf16_params", ()))
        params = {}
        for k in z.files:
            if not k.startswith("p:"):
                continue
            name, arr = k[2:], z[k]
            if name in bf16:
                arr = jnp.asarray(arr.view(np.uint16)).view(jnp.bfloat16)
            params[name] = jnp.asarray(arr)
    return ExportedModel(exported, params, meta)
