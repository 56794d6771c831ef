"""Graph optimization passes (beyond the import-time canonicalization in
graph.py).

These run before quantization/lowering:

- fuse_conv_bias_add: Conv followed by Add of a constant per-channel bias
  becomes Conv-with-bias (the CNTK MNIST export uses separate Add nodes with
  [C,1,1] initializers — reference handles this as its "mode 1" add,
  add_op.rs:75). Numerically identical; lets the quantizer treat conv+bias
  as one int8 op instead of leaving an fp32 island between QLinearConvs.
- fold_batchnorm: inference-mode BatchNormalization after a Conv folds into
  the conv weights/bias (w' = w·k, b' = (b−mean)·k + beta, k = γ/√(var+ε)).
  Turns ResNet's Conv→BN→Relu backbone into Conv→Relu so the whole spine
  stays in the int8 domain after quantization.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .graph import Graph, Node, prune_dead

__all__ = ["fuse_conv_bias_add", "fold_batchnorm", "optimize"]


def _consumer_count(g: Graph) -> Dict[str, int]:
    counts: Dict[str, int] = {}
    for n in g.nodes:
        for i in n.inputs:
            counts[i] = counts.get(i, 0) + 1
    for o in g.outputs:
        counts[o] = counts.get(o, 0) + 1
    return counts


def fuse_conv_bias_add(g: Graph) -> int:
    """Returns number of fusions performed (mutates g)."""
    producers = {o: idx for idx, n in enumerate(g.nodes) for o in n.outputs}
    counts = _consumer_count(g)
    fused = 0
    new_nodes: List[Node] = []
    skip: set = set()
    for idx, n in enumerate(g.nodes):
        if idx in skip:
            continue
        if n.op_type == "Add":
            a, b = n.inputs[0], n.inputs[1]
            conv_idx = producers.get(a)
            bias = g.constants.get(b)
            if (conv_idx is not None and bias is not None
                    and g.nodes[conv_idx].op_type == "Conv"
                    and counts.get(a, 0) == 1
                    and conv_idx < idx):
                conv = g.nodes[conv_idx]
                out_c = None
                w = g.constants.get(conv.inputs[1])
                if w is not None:
                    out_c = w.shape[0]
                flat = bias.reshape(-1)
                # bias must be exactly one value per output channel
                if out_c is not None and flat.size == out_c and \
                        bias.size == flat.size:
                    if len(conv.inputs) > 2 and conv.inputs[2]:
                        old = g.constants[conv.inputs[2]]
                        flat = flat + old.reshape(-1)
                    bias_name = f"{conv.outputs[0]}__fused_b"
                    g.constants[bias_name] = flat.astype(np.float32)
                    g.weight_names.append(bias_name)
                    conv.inputs = [conv.inputs[0], conv.inputs[1], bias_name]
                    conv.outputs = [n.outputs[0]]  # take over Add's output name
                    fused += 1
                    continue  # drop the Add node
        new_nodes.append(n)
    if fused:
        g.nodes = new_nodes
        prune_dead(g)
    return fused


def fold_batchnorm(g: Graph) -> int:
    """Returns number of BN nodes folded (mutates g)."""
    producers = {o: idx for idx, n in enumerate(g.nodes) for o in n.outputs}
    counts = _consumer_count(g)
    folded = 0
    new_nodes: List[Node] = []
    for idx, n in enumerate(g.nodes):
        if n.op_type == "BatchNormalization":
            x = n.inputs[0]
            conv_idx = producers.get(x)
            params = [g.constants.get(i) for i in n.inputs[1:5]]
            if (conv_idx is not None and g.nodes[conv_idx].op_type == "Conv"
                    and counts.get(x, 0) == 1
                    and all(p is not None for p in params)):
                conv = g.nodes[conv_idx]
                w = g.constants.get(conv.inputs[1])
                group = int(conv.attr("group", 1))
                if w is not None and group == 1:
                    gamma, beta, mean, var = [p.astype(np.float64)
                                              for p in params]
                    eps = float(n.attr("epsilon", 1e-5))
                    k = gamma / np.sqrt(var + eps)  # [C_out]
                    w_new = (w.astype(np.float64)
                             * k.reshape(-1, *([1] * (w.ndim - 1))))
                    if len(conv.inputs) > 2 and conv.inputs[2]:
                        b_old = g.constants[conv.inputs[2]].astype(np.float64)
                    else:
                        b_old = np.zeros(w.shape[0])
                    b_new = (b_old - mean) * k + beta

                    w_name = f"{conv.inputs[1]}__bnfold"
                    b_name = f"{conv.outputs[0]}__bnfold_b"
                    g.constants[w_name] = w_new.astype(np.float32)
                    g.constants[b_name] = b_new.astype(np.float32)
                    g.weight_names += [w_name, b_name]
                    conv.inputs = [conv.inputs[0], w_name, b_name]
                    conv.outputs = [n.outputs[0]]  # take over BN's output name
                    folded += 1
                    continue  # drop the BN node
        new_nodes.append(n)
    if folded:
        g.nodes = new_nodes
        prune_dead(g)
    return folded


def optimize(g: Graph) -> Graph:
    """Run all fusions to fixpoint (mutates and returns g)."""
    for _ in range(3):
        changed = fuse_conv_bias_add(g) + fold_batchnorm(g)
        if not changed:
            break
    return g
