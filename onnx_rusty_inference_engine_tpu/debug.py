"""Per-node intermediate tensor inspection.

The reference's `debug_prints` feature dumps actual tensors mid-graph
(reference: src/inference_fp32_ops/convolution_op.rs:165-168,185-187 —
prints input/kernel/output values inside each op when the cargo feature is
on). A node-walking runtime gets that for free; our whole-graph-as-one-XLA-
program design does not, so we recover it the TPU-native way: build a
PROBE graph whose outputs are every intermediate value and run that one
jitted program. XLA dedups the shared prefix work, the host sees every
tensor once, and the real inference graph is untouched.

Exposed on the CLI as `oriet run --dump-stats` (per-node min/max/mean to
stderr) and `--dump-tensors out.npz` (full values). `quant.calibrate`
shares the same probe-graph builder.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .graph import Graph


def probe_graph(graph: Graph, names: Optional[Sequence[str]] = None,
                max_tensors: Optional[int] = None) -> Graph:
    """A copy of `graph` whose outputs are every intermediate tensor (or
    the given `names`), in topological production order. Inputs are
    included so the probe also surfaces what the model actually saw."""
    if names is None:
        out: List[str] = []
        seen = set(graph.constants)
        for spec in graph.inputs:
            out.append(spec.name)
            seen.add(spec.name)
        for node in graph.nodes:
            for o in node.outputs:
                if o and o not in seen:
                    out.append(o)
                    seen.add(o)
        names = out
    if max_tensors is not None and len(names) > max_tensors:
        import logging
        logging.getLogger(__name__).warning(
            "probe graph truncated to first %d of %d tensors",
            max_tensors, len(names))
        names = list(names)[:max_tensors]
    return Graph(
        name=graph.name,
        nodes=graph.nodes,
        constants=graph.constants,
        inputs=graph.inputs,
        outputs=list(names),
        opset=graph.opset,
        weight_names=graph.weight_names,
    )


def dump_intermediates(graph: Graph, feed: Dict[str, np.ndarray],
                       names: Optional[Sequence[str]] = None,
                       ) -> Dict[str, np.ndarray]:
    """Run the probe graph once; return {tensor_name: value} for every
    intermediate (or just `names`). One compile, one device round-trip."""
    import jax
    import jax.numpy as jnp

    from .engine import lower

    probe = probe_graph(graph, names)
    fn = jax.jit(lower(probe))
    params = {k: jnp.asarray(graph.constants[k]) for k in graph.weight_names}
    out = fn(params, {k: jnp.asarray(v) for k, v in feed.items()})
    return {k: np.asarray(v) for k, v in out.items()}


def tensor_stats(values: Dict[str, np.ndarray]) -> List[Dict]:
    """Compact per-tensor stats rows (what --dump-stats prints)."""
    rows = []
    for name, v in values.items():
        row = {"name": name, "shape": list(v.shape), "dtype": str(v.dtype)}
        if np.issubdtype(v.dtype, np.number) and v.size:
            vf = v.astype(np.float64)
            row.update(min=float(vf.min()), max=float(vf.max()),
                       mean=float(vf.mean()))
            if np.issubdtype(v.dtype, np.floating):
                row["nonfinite"] = int((~np.isfinite(vf)).sum())
        rows.append(row)
    return rows
