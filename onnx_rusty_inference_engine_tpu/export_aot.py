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


def _stage_blob(nodes, constants: Dict[str, np.ndarray]) -> np.ndarray:
    """Host-stage nodes + their constants as a serialized mini ModelProto
    (the same wire codec as everything else) → uint8 array for the npz."""
    from . import onnx_io
    from .models._builder import _attr

    gp = onnx_io.GraphProto(name="host_stage")
    for n in nodes:
        proto = onnx_io.NodeProto(op_type=n.op_type, input=list(n.inputs),
                                  output=list(n.outputs), name=n.name,
                                  domain=n.domain)
        for k, v in n.attrs.items():
            if not k.startswith("__"):
                proto.attributes[k] = _attr(k, v)
        gp.nodes.append(proto)
    gp.initializers = dict(constants)
    blob = onnx_io.serialize_model(
        onnx_io.ModelProto(graph=gp, opset_version=13))
    return np.frombuffer(blob, dtype=np.uint8)


def _stage_nodes(blob: np.ndarray):
    from . import onnx_io
    from .graph import _node_from_proto

    m = onnx_io.parse_model(bytes(blob))
    return ([_node_from_proto(n) for n in m.graph.nodes],
            dict(m.graph.initializers))


def export_engine(engine: Engine, example_inputs: Dict[str, np.ndarray],
                  out_path: str,
                  platforms: Optional[Sequence[str]] = None) -> None:
    """Serialize `engine`'s compiled program + weights to `out_path`.

    example_inputs fixes the (static) input shapes/dtypes the artifact
    accepts — same contract as the jit itself. platforms defaults to the
    current backend; pass e.g. ["cpu", "tpu"] for a dual-target artifact.

    Host stages survive export: a string/image prolog or a map/string
    epilog (sklearn pipelines — host.py) is bundled as a serialized
    mini-graph and re-hydrated by load_exported; only the device part is
    StableHLO.
    """
    from jax import export as jexport

    host, epilog = engine._host, engine._epilog
    if host is not None:
        dev_feed, _ = engine._apply_host(example_inputs)
        inputs = engine._canon_inputs(dev_feed)
    else:
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
    if host is not None:
        meta["host_prolog"] = {
            "boundary": list(host.boundary),
            "host_outputs": list(host.host_outputs),
            "consumed_inputs": list(host.consumed_inputs),
            "orig_input_names": list(host.orig_input_names),
        }
        payload["__prolog__"] = _stage_blob(host.nodes, host.constants)
    if epilog is not None:
        meta["host_epilog"] = {
            "boundary": list(epilog.boundary),
            "consumed_inputs": list(epilog.consumed_inputs),
            "outputs": list(epilog.outputs),
            "extra_boundary": list(epilog.extra_boundary),
            "transforms": sorted(epilog.transforms),
        }
        consts = dict(epilog.constants)
        consts.update({f"__xform__:{k}": np.asarray(v, dtype=object)
                       for k, v in epilog.transforms.items()})
        payload["__epilog__"] = _stage_blob(epilog.nodes, consts)
        meta["outputs"] = sorted(set(meta["outputs"])
                                 | set(epilog.outputs))
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

    def __init__(self, exported, params: Dict[str, jax.Array], meta: dict,
                 host=None, epilog=None):
        self._exported = exported
        self.params = params
        self.meta = meta
        self.input_specs = meta["inputs"]
        self.outputs: List[str] = meta["outputs"]
        self.platforms = meta["platforms"]
        self.nr_devices = int(meta.get("nr_devices", 1))
        self._sharding = None
        self._host = host      # rehydrated HostProlog (host.py) or None
        self._epilog = epilog  # rehydrated HostEpilog or None

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
        host_outputs: Dict[str, np.ndarray] = {}
        if self._host is not None:
            h = self._host
            if isinstance(inputs, (list, tuple)):
                inputs = dict(zip(h.orig_input_names, inputs))
            need = set(h.consumed_inputs)
            hout = h.run({k: np.asarray(v) for k, v in inputs.items()
                          if k in need})
            dev = {k: v for k, v in inputs.items() if k in self.input_specs}
            dev.update({b: hout[b] for b in h.boundary})
            host_outputs = {o: hout[o] for o in h.host_outputs}
            inputs = dev
        feed = {k: jnp.asarray(v) for k, v in inputs.items()}
        missing = set(self.input_specs) - set(feed)
        if missing:
            raise ValueError(f"missing inputs: {sorted(missing)}")
        out = dict(self._exported.call(self._placed(self.params),
                                       self._placed(feed)))
        out.update(host_outputs)
        if self._epilog is not None:
            ep = self._epilog.run(out, feed)
            for b in self._epilog.extra_boundary:
                out.pop(b, None)
            out.update(ep)
        return out

    def run(self, inputs) -> Dict[str, np.ndarray]:
        from .engine import Engine

        return {k: Engine._to_host(v) for k, v in self(inputs).items()}


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
        host = epilog = None
        if "host_prolog" in meta:
            from .host import HostProlog

            nodes, consts = _stage_nodes(z["__prolog__"])
            hp = meta["host_prolog"]
            host = HostProlog(nodes, consts, hp["boundary"],
                              hp["host_outputs"], hp["consumed_inputs"],
                              hp["orig_input_names"])
        if "host_epilog" in meta:
            from .host import HostEpilog

            nodes, consts = _stage_nodes(z["__epilog__"])
            he = meta["host_epilog"]
            transforms = {k[len("__xform__:"):]: v
                          for k, v in consts.items()
                          if k.startswith("__xform__:")}
            consts = {k: v for k, v in consts.items()
                      if not k.startswith("__xform__:")}
            epilog = HostEpilog(nodes, consts, transforms, he["boundary"],
                                he["consumed_inputs"], he["outputs"],
                                he["extra_boundary"])
    return ExportedModel(exported, params, meta, host, epilog)
