"""Pipeline parallelism: GPipe-style stage execution over a mesh axis.

The reference has no pipeline story at all (its scheduler is a
thread-per-branch walk of one replica, multithreading/*); this module is
the TPU-native answer for models whose weights exceed one chip's HBM:

- The imported ONNX graph is CUT at its residual-stream tensors into a
  *prefix* (embeddings + any position/mask tensors shared by every layer),
  N isomorphic *layer blocks*, and a *suffix* (final norm + head).
- The blocks' per-layer weights are STACKED on a leading [n_layers, ...]
  axis and sharded over the mesh's "pipe" axis — each device materialises
  only its own stage's layers (the actual memory win of pipelining).
- One `jax.shard_map` program runs the classic GPipe schedule: M
  microbatches flow through S stages in M+S-1 steps; activations move
  between adjacent stages with `lax.ppermute` (ICI neighbours on real
  hardware), every device running the SAME program (SPMD) with its own
  stage's weight shard.

DECODE graphs pipeline too (the serving case): per-layer graph inputs
(past_key_i / past_value_i caches, kv_scale_* scales) are stacked and
pipe-sharded exactly like weights — each stage holds only its own layers'
KV cache — and per-layer outputs (present_*) come back as ONE stacked
[n_layers, ...] array still sharded over the pipe axis, so the cache
round-trips device-resident. Tensors computed once from shared inputs
(the position masks every layer reads) are hoisted into the prefix and
broadcast to all stages.

This is the scaling-book recipe (stacked stage weights + shift
collectives), not a translation of a thread/queue scheduler. Everything
stays inside ONE jitted computation: no host round-trips between stages,
no per-stage executables.

Scope: transformer-style trunks whose blocks are structurally isomorphic
(same op sequence; per-layer constants/inputs may differ — they are
stacked; values identical across layers stay closed-over or shared).
Blocks must contain no control-flow subgraphs. `infer_boundaries`
recognises the repo's decoder families (gpt2/moe: blk{i}_res2, llama:
l{i}_res2, trunk input h0).

Note the measured caveat for LATENCY use (PERF.md "scan-over-layers"):
slicing stacked weights per step costs on the decode hot path. Pipelining
is a CAPACITY lever — use it when the model doesn't fit one chip, with
data/tensor parallelism (parallel/sharding.py) as the first choice
otherwise.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class PipelineError(ValueError):
    """The graph cannot be pipelined as requested (non-isomorphic blocks,
    entangled cross-layer edges, control flow inside a block, bad
    divisibility)."""


# --------------------------------------------------------------------------
# Graph surgery
# --------------------------------------------------------------------------
_BOUNDARY_RE = re.compile(r"^(?:blk|l)(\d+)_res2$")


def infer_boundaries(graph) -> List[str]:
    """[trunk_in, layer0_out, ..., layerN-1_out]. Tries the repo's naming
    convention first (gpt2/llama/moe: blk{i}_res2 / l{i}_res2, trunk
    input h0), then falls back to STRUCTURAL detection — periodic
    isomorphic-block hashing along the node list — so external ONNX
    decoders with foreign tensor names pipeline without `boundaries=`."""
    try:
        return _infer_boundaries_named(graph)
    except PipelineError as named_err:
        try:
            return infer_boundaries_structural(graph)
        except PipelineError as struct_err:
            raise PipelineError(
                f"{named_err} Structural inference also failed: "
                f"{struct_err}") from None


def _infer_boundaries_named(graph) -> List[str]:
    produced = {o for n in graph.nodes for o in n.outputs if o}
    layers: Dict[int, str] = {}
    for name in produced:
        m = _BOUNDARY_RE.match(name)
        if m:
            layers[int(m.group(1))] = name
    if not layers or "h0" not in produced:
        raise PipelineError(
            "cannot infer pipeline boundaries: expected trunk input 'h0' and "
            "per-layer residuals 'blk{i}_res2'/'l{i}_res2'; pass boundaries=")
    idxs = sorted(layers)
    if idxs != list(range(len(idxs))):
        raise PipelineError(f"non-contiguous layer indices: {idxs}")
    return ["h0"] + [layers[i] for i in idxs]


def _node_sig(n) -> tuple:
    """Name-free structural signature — the same equivalence align_blocks
    enforces (op sequence + arity), so a structurally-proposed cut is
    exactly what the stacking machinery can consume."""
    return (n.op_type, n.domain, len(n.inputs), len(n.outputs))


def _periodic_window(sigs: List[tuple]) -> Tuple[int, int, int]:
    """Largest periodic run in the signature sequence: returns
    (start, period, span_end) for the run maximizing repeats*period
    (coverage), then repeats (so a 2-layer 'super-period' never shadows
    the true layer period). span_end is the exclusive end of the FULL
    periodic extent, which can exceed start + repeats*period by a
    partial block — phase shifts recover complete blocks from it.
    Raises if nothing repeats."""
    N = len(sigs)
    ids = {}
    S = np.fromiter((ids.setdefault(s, len(ids)) for s in sigs),
                    np.int64, N)
    best = None  # (coverage, repeats, -start)
    out = None
    for p in range(1, N // 2 + 1):
        eq = S[p:] == S[:-p]                       # eq[i]: S[i] == S[i+p]
        i = 0
        while i < eq.size:
            if not eq[i]:
                i += 1
                continue
            j = i
            while j < eq.size and eq[j]:
                j += 1
            run = j - i                            # S[i..i+run+p-1] periodic
            reps = run // p + 1
            if reps >= 2:
                cov = reps * p
                key = (cov, reps, -i)
                if best is None or key > best:
                    best, out = key, (i, p, i + run + p)  # full extent
            i = j
    if out is None:
        raise PipelineError("no repeated block structure found")
    return out


def _window_phases(start: int, p: int, span_end: int):
    """All phase shifts of a periodic window (the maximal run can begin
    mid-block, putting the residual add at the wrong edge): yields
    (start+d, p, reps_d) for every d that still holds >= 2 full periods
    inside the periodic extent [start, span_end), fullest-first."""
    phases = []
    for d in range(p):
        r = (span_end - (start + d)) // p
        if r >= 2:
            phases.append((r, start + d))
    phases.sort(key=lambda x: (-x[0], x[1]))
    for r, s in phases:
        yield s, p, r


def infer_boundaries_structural(graph) -> List[str]:
    """Detect the trunk by periodic isomorphic-block hashing: find the
    longest run of repeated node-signature blocks, then the positional
    tensor family crossing every consecutive block pair (the residual
    stream). Each candidate family is VALIDATED by split_stages +
    align_blocks — the proposal is only returned if the graph actually
    partitions and stacks along it."""
    nodes = graph.nodes
    w0, p, span_end = _periodic_window([_node_sig(n) for n in nodes])
    errors: List[str] = []
    for start, _, k in _window_phases(w0, p, span_end):
        blocks = [nodes[start + i * p: start + (i + 1) * p]
                  for i in range(k)]
        # positional families of tensors crossing consecutive blocks:
        # ((producer node offset, out slot), (consumer node offset, slot))
        fams = None
        for i in range(k - 1):
            produced = {o: (t, s) for t, n in enumerate(blocks[i])
                        for s, o in enumerate(n.outputs) if o}
            cur = set()
            for t, n in enumerate(blocks[i + 1]):
                for s, inp in enumerate(n.inputs):
                    if inp in produced:
                        cur.add((produced[inp], (t, s)))
            fams = cur if fams is None else fams & cur
        if not fams:
            errors.append(f"phase {start}: no tensor family crosses "
                          "every consecutive block pair")
            continue
        # residual stream enters its block early: low consumer offset 1st
        for (pt, ps), (ct, cs) in sorted(fams, key=lambda f: (f[1], f[0])):
            bnds = [blocks[0][ct].inputs[cs]] + [
                blocks[i][pt].outputs[ps] for i in range(k)]
            try:
                align_blocks(split_stages(graph, bnds))
                return bnds
            except PipelineError as e:
                errors.append(f"phase {start} cut {bnds[0]}->{bnds[1]}: "
                              f"{e}")
    raise PipelineError(
        "no periodic phase yields a valid stage partition: "
        + "; ".join(errors[:4]))


def _backward_slice(graph, targets: Sequence[str], stop: set) -> List:
    """Nodes (in original topo order) needed to compute `targets` from
    `stop` ∪ constants ∪ graph inputs."""
    from ..graph import node_deps

    producers = graph.producers()
    graph_inputs = set(graph.input_names)
    needed: set = set()
    frontier = list(targets)
    while frontier:
        name = frontier.pop()
        if name in stop or name in graph.constants or name in graph_inputs:
            continue
        n = producers.get(name)
        if n is None:
            raise PipelineError(f"no producer for '{name}'")
        if id(n) in needed:
            continue
        needed.add(id(n))
        frontier.extend(node_deps(n))
    return [n for n in graph.nodes if id(n) in needed]


def _subgraph(graph, nodes: List, inputs: List[str], outputs: List[str],
              name: str):
    """Build a Graph view over `nodes` with only the constants they use."""
    from ..graph import Graph, InputSpec, node_deps

    used: set = set()
    for n in nodes:
        used.update(node_deps(n))
    consts = {k: v for k, v in graph.constants.items() if k in used}
    return Graph(
        name=name,
        nodes=list(nodes),
        constants=consts,
        inputs=[InputSpec(i, ("?",), np.dtype(np.float32)) for i in inputs],
        outputs=list(outputs),
        opset=graph.opset,
        opsets=dict(graph.opsets),
        weight_names=[k for k in graph.weight_names if k in consts],
    )


@dataclasses.dataclass
class StagePlan:
    """Partition of a graph into prefix / layer blocks / suffix.

    prefix outputs [boundary_0] + `shared` (per-model tensors every layer
    reads, hoisted out of the trunk); block i maps boundary_i →
    boundary_{i+1} plus its `extra` per-layer outputs (e.g. presents);
    suffix maps boundary_N (+ prefix/shared tensors + graph inputs) to the
    remaining graph outputs."""

    prefix: object
    blocks: List[object]
    suffix: object
    boundaries: List[str]
    shared: List[str]                      # prefix-computed, read by blocks
    block_outputs: List[List[str]]         # extra outputs per block

    def __iter__(self):  # (prefix, blocks, suffix) unpacking convenience
        return iter((self.prefix, self.blocks, self.suffix))


def split_stages(graph, boundaries: Sequence[str]) -> StagePlan:
    """Cut `graph` at `boundaries`. Nodes reachable from more than one
    block's slice (masks computed from shared inputs) are hoisted into the
    prefix; graph outputs produced inside a block (KV presents) become
    that block's extra outputs. Every node lands in exactly one stage."""
    bnds = list(boundaries)
    if len(bnds) < 2:
        raise PipelineError("need at least [trunk_in, one layer boundary]")
    producers = graph.producers()

    # 1st pass: independent block slices; multiply-claimed nodes → shared
    raw = [_backward_slice(graph, [bnds[i + 1]], stop={bnds[i]})
           for i in range(len(bnds) - 1)]
    counts: Dict[int, int] = {}
    for sl in raw:
        for n in sl:
            counts[id(n)] = counts.get(id(n), 0) + 1
    shared_nodes = {i for i, c in counts.items() if c > 1}
    shared_tensors = {o for n in graph.nodes if id(n) in shared_nodes
                      for o in n.outputs if o}

    # 2nd pass with shared tensors as stops → exclusive per-layer nodes
    block_nodes = [
        _backward_slice(graph, [bnds[i + 1]], stop={bnds[i]} | shared_tensors)
        for i in range(len(bnds) - 1)
    ]
    owner: Dict[int, int] = {}
    for i, sl in enumerate(block_nodes):
        for n in sl:
            prev = owner.get(id(n))
            if prev is not None:
                raise PipelineError(
                    f"node '{n.outputs[0]}' is entangled between layers "
                    f"{prev} and {i} even after hoisting shared tensors — "
                    "boundaries do not partition the trunk")
            owner[id(n)] = i

    # prefix: trunk input + every shared tensor the blocks actually read
    from ..graph import node_deps

    shared_used = sorted({d for sl in block_nodes for n in sl
                          for d in node_deps(n) if d in shared_tensors})
    prefix_nodes = _backward_slice(graph, [bnds[0]] + shared_used,
                                   stop=set())
    for n in prefix_nodes:
        if id(n) in owner:
            raise PipelineError(
                f"prefix and block {owner[id(n)]} overlap at "
                f"'{n.outputs[0]}' — a shared tensor depends on a boundary")

    # outputs: claimed-tensor stops route each output to its producer
    # stage (-1 = prefix, -2 = suffix, >= 0 = block index)
    claimed = dict(owner)
    for n in prefix_nodes:
        claimed[id(n)] = -1
    claimed_tensors = {o for n in graph.nodes if id(n) in claimed
                       for o in n.outputs if o}
    block_extra: List[List[str]] = [[] for _ in block_nodes]
    suffix_targets: List[str] = []
    for o in graph.outputs:
        if o in claimed_tensors:  # produced by an already-assigned node
            seg = claimed[id(producers[o])]
            if seg == -1:
                raise PipelineError(
                    f"output '{o}' is produced by the prefix — not supported")
            (suffix_targets if seg == -2 else block_extra[seg]).append(o)
            continue
        sl = _backward_slice(graph, [o], stop=claimed_tensors)
        segs = {claimed[id(producers[d])]
                for n in sl for d in node_deps(n)
                if d in claimed_tensors and d != bnds[-1]}
        block_deps = {x for x in segs if x >= 0}
        if len(block_deps) > 1:
            raise PipelineError(
                f"output '{o}' depends on several layers: "
                f"{sorted(block_deps)}")
        seg = block_deps.pop() if block_deps else -2
        if seg >= 0 and -2 in segs:
            raise PipelineError(
                f"output '{o}' mixes layer and suffix dataflow")
        for n in sl:
            claimed[id(n)] = seg
            claimed_tensors.update(x for x in n.outputs if x)
            if seg >= 0:
                owner[id(n)] = seg
        if seg >= 0:
            block_nodes[seg] = [n for n in graph.nodes
                                if owner.get(id(n)) == seg]
            block_extra[seg].append(o)
        else:
            suffix_targets.append(o)
    suffix_nodes = [n for n in graph.nodes if claimed.get(id(n)) == -2]

    # completeness: every node in exactly one stage
    total = len(prefix_nodes) + len(suffix_nodes) + sum(
        len(b) for b in block_nodes)
    if total != len(graph.nodes):
        missing = [n.outputs[0] for n in graph.nodes
                   if id(n) not in claimed]
        raise PipelineError(f"nodes outside every stage: {missing[:5]}")

    prefix = _subgraph(graph, prefix_nodes, graph.input_names,
                       [bnds[0]] + shared_used, f"{graph.name}:prefix")
    blocks = [
        _subgraph(graph, block_nodes[i], [bnds[i]] + shared_used,
                  [bnds[i + 1]] + block_extra[i], f"{graph.name}:blk{i}")
        for i in range(len(block_nodes))
    ]
    suffix = _subgraph(graph, suffix_nodes,
                       [bnds[-1]] + shared_used + graph.input_names,
                       suffix_targets, f"{graph.name}:suffix")
    return StagePlan(prefix, blocks, suffix, bnds, shared_used, block_extra)


@dataclasses.dataclass
class AlignedBlocks:
    """Isomorphism proof + canonicalisation of a StagePlan's blocks."""

    canonical: object                       # block 0's graph, layer consts removed
    stacked: Dict[str, np.ndarray]          # canon const name → [n_layers, ...]
    layer_inputs: Dict[str, List[str]]      # canon input name → per-layer names
    shared_inputs: List[str]                # names read identically by all blocks
    extra_outputs: Dict[str, List[str]]     # canon output name → per-layer names


def align_blocks(plan: StagePlan) -> AlignedBlocks:
    """Verify the blocks are isomorphic; classify their non-boundary inputs
    as stacked constants (per-layer weights), stacked layer inputs
    (per-layer graph inputs, e.g. KV caches), or shared inputs; map their
    extra outputs positionally."""
    blocks = plan.blocks
    b0 = blocks[0]
    sig0 = [(n.op_type, n.domain, len(n.inputs)) for n in b0.nodes]
    for g in blocks[1:]:
        sig = [(n.op_type, n.domain, len(n.inputs)) for n in g.nodes]
        if sig != sig0:
            raise PipelineError(
                f"blocks are not isomorphic: {b0.name} vs {g.name} differ in "
                "op sequence — cannot stack stage weights")
    for g in blocks:
        for n in g.nodes:
            if "__captures__" in n.attrs or any(
                    hasattr(v, "nodes") for v in n.attrs.values()):
                raise PipelineError(
                    f"control-flow subgraph inside block ({n.op_type}) — "
                    "pipelining does not support nested graphs")

    n_layers = len(blocks)
    interior = [{o for n in g.nodes for o in n.outputs if o} for g in blocks]
    const_corr: Dict[str, List[str]] = {}
    layer_inputs: Dict[str, List[str]] = {}
    shared_inputs: List[str] = []
    seen_shared: set = set()

    for t, n0 in enumerate(b0.nodes):
        for slot, i0 in enumerate(n0.inputs):
            if not i0:
                continue
            names = [blocks[j].nodes[t].inputs[slot] for j in range(n_layers)]
            kinds = set()
            for j, nm in enumerate(names):
                if nm in blocks[j].constants:
                    kinds.add("const")
                elif nm in interior[j]:
                    kinds.add("interior")
                elif nm == plan.boundaries[j]:
                    kinds.add("boundary")
                else:
                    kinds.add("input")
            if len(kinds) != 1:
                raise PipelineError(
                    f"input slot {slot} of node {t} has mixed roles across "
                    f"layers: {sorted(kinds)}")
            kind = kinds.pop()
            if kind in ("interior", "boundary"):
                continue
            if kind == "const":
                prev = const_corr.get(i0)
                if prev is not None and prev != names:
                    raise PipelineError(
                        f"constant '{i0}' corresponds inconsistently")
                const_corr[i0] = names
                continue
            # graph-input slot: identical everywhere → shared; all-distinct
            # per-layer names → stacked layer input
            if len(set(names)) == 1:
                if i0 not in seen_shared:
                    seen_shared.add(i0)
                    shared_inputs.append(i0)
            elif len(set(names)) == n_layers:
                prev = layer_inputs.get(i0)
                if prev is not None and prev != names:
                    raise PipelineError(
                        f"layer input '{i0}' corresponds inconsistently")
                layer_inputs[i0] = names
            else:
                raise PipelineError(
                    f"input slot {slot} of node {t} is neither shared nor "
                    f"per-layer: {names}")

    # extra outputs correspond positionally (same (node, slot) per layer)
    extra_outputs: Dict[str, List[str]] = {}
    out_pos0 = {}
    for t, n0 in enumerate(b0.nodes):
        for slot, o0 in enumerate(n0.outputs):
            if o0 and o0 in plan.block_outputs[0]:
                out_pos0[o0] = (t, slot)
    if len(out_pos0) != len(plan.block_outputs[0]):
        raise PipelineError("block 0 extra outputs not all node outputs")
    for o0, (t, slot) in out_pos0.items():
        names = [blocks[j].nodes[t].outputs[slot] for j in range(n_layers)]
        for j, nm in enumerate(names):
            if nm not in plan.block_outputs[j]:
                raise PipelineError(
                    f"output slot {slot} of node {t} is a graph output in "
                    f"block 0 ({o0}) but not in block {j} ({nm})")
        extra_outputs[o0] = names

    stacked: Dict[str, np.ndarray] = {}
    shared_consts: Dict[str, np.ndarray] = {}
    for i0, names in const_corr.items():
        vals = [np.asarray(blocks[j].constants[names[j]])
                for j in range(n_layers)]
        ref = vals[0]
        for v in vals[1:]:
            if v.shape != ref.shape or v.dtype != ref.dtype:
                raise PipelineError(
                    f"constant '{i0}' varies in shape/dtype across layers: "
                    f"{ref.shape}/{ref.dtype} vs {v.shape}/{v.dtype}")
        if all(np.array_equal(ref, v) for v in vals[1:]):
            shared_consts[i0] = ref
        else:
            stacked[i0] = np.stack(vals)

    from ..graph import Graph

    canonical = Graph(
        name=b0.name + ":canon",
        nodes=b0.nodes,
        constants=shared_consts,  # stacked ones arrive via the params dict
        inputs=list(b0.inputs),
        outputs=list(b0.outputs),
        opset=b0.opset,
        opsets=dict(b0.opsets),
        weight_names=[],
    )
    return AlignedBlocks(canonical, stacked, layer_inputs, shared_inputs,
                         extra_outputs)


# --------------------------------------------------------------------------
# Pipelined executor
# --------------------------------------------------------------------------
class PipelinedDecoder:
    """Run a decoder forward (or decode step) with its trunk pipelined
    over `axis`.

    One jitted program: prefix (replicated: embeddings + shared masks) →
    shard_map GPipe trunk (stage weights AND per-layer graph inputs such
    as KV caches sharded over `axis`; activations ppermute-shifted) →
    suffix (replicated). Output matches the unpipelined Engine to fp32
    reduction-order noise.

    Parameters
    ----------
    graph: imported Graph (e.g. import_model(build_gpt2_decode(...))).
    mesh: jax Mesh containing `axis`; other axes are ignored (replicated).
    boundaries: residual tensor names; inferred for the repo's families.
    microbatches: GPipe M (default: the stage count). batch % M == 0.
    batch_inputs: names of graph inputs whose dim 0 is the batch (the
        microbatch-sliced set). Default: inputs with a symbolic dim 0 in
        their InputSpec; if the graph declares no symbolic dims at all,
        a shape heuristic (dim == B) is used — pass the list explicitly
        for graphs where a non-batch dim can coincide with the batch
        (e.g. kv_scale [H] when n_head == batch).

    Call styles
    -----------
    __call__(inputs): plain Engine-compatible dict in/out (per-layer
        inputs under their ONNX names; host-side stack per call).
    stacked_call(inputs, stacked_ins): per-layer inputs pre-stacked
        [n_layers, ...] under canonical (layer-0) names; extra outputs
        returned stacked and STILL SHARDED over the pipe axis — the
        device-resident KV path for generation loops.
    """

    def __init__(self, graph, mesh: Mesh, *, axis: str = "pipe",
                 boundaries: Optional[Sequence[str]] = None,
                 microbatches: Optional[int] = None,
                 batch_inputs: Optional[Sequence[str]] = None,
                 dtype: str = "float32"):
        from ..engine import lower

        # compute dtype policy, same contract as Engine(dtype=...): float
        # params cast once at init, float inputs cast at entry, float
        # outputs cast back to fp32 — the bf16 prefill lever works
        # pipelined too (round-4 verdict item 4: the fp32-only guard)
        self._cast = None if np.dtype(dtype) == np.float32 \
            else jnp.dtype(dtype)

        if axis not in mesh.axis_names:
            raise PipelineError(f"mesh has no '{axis}' axis: {mesh.axis_names}")
        S = mesh.shape[axis]
        bnds = list(boundaries) if boundaries is not None \
            else infer_boundaries(graph)
        plan = split_stages(graph, bnds)
        n_layers = len(plan.blocks)
        if n_layers % S:
            raise PipelineError(
                f"{n_layers} layers do not divide over {S} pipeline stages")
        lps = n_layers // S
        al = align_blocks(plan)

        self.graph, self.mesh, self.axis = graph, mesh, axis
        self.n_stages, self.n_layers = S, n_layers
        self.layers_per_stage = lps
        self.microbatches = microbatches or S
        self.plan, self.aligned = plan, al
        self._b_in, self._b_out = bnds[0], bnds[-1]

        prefix_fn = lower(plan.prefix)
        block_fn = lower(al.canonical)
        suffix_fn = lower(plan.suffix)

        # Batch-dim classification (which inputs get microbatch-sliced).
        # Prefer declared semantics over the shape heuristic: an explicit
        # `batch_inputs` list, or symbolic dim-0 in the InputSpecs.  The
        # shape heuristic (dim == B) misfires when an unrelated dim
        # coincides with the batch, e.g. kv_scale [H] with n_head == B.
        specs = {s.name: s for s in graph.inputs}
        if batch_inputs is None and any(
                isinstance(d, str) for s in graph.inputs for d in s.shape):
            batch_inputs = [s.name for s in graph.inputs
                            if s.shape and isinstance(s.shape[0], str)]
        static_mb: Optional[Tuple[Dict[str, bool], Dict[str, bool]]] = None
        if batch_inputs is not None:
            unknown = set(batch_inputs) - set(specs)
            if unknown:
                raise PipelineError(
                    f"batch_inputs not graph inputs: {sorted(unknown)}")
            is_batch = {n: n in set(batch_inputs) for n in specs}

            # prefix-computed shared tensors: probe whether their leading
            # dim co-varies with the batch (abstract eval at B and 2B)
            def _sd(spec, mult):
                shape = list(spec.concrete_shape(2))
                if is_batch[spec.name] and shape:
                    shape[0] *= mult
                return jax.ShapeDtypeStruct(
                    tuple(shape), jax.dtypes.canonicalize_dtype(spec.dtype))

            params_sd = {
                k: jax.ShapeDtypeStruct(
                    np.shape(plan.prefix.constants[k]),
                    jax.dtypes.canonicalize_dtype(
                        np.asarray(plan.prefix.constants[k]).dtype))
                for k in plan.prefix.weight_names}
            base = jax.eval_shape(prefix_fn, params_sd,
                                  {n: _sd(s, 1) for n, s in specs.items()})
            dbl = jax.eval_shape(prefix_fn, params_sd,
                                 {n: _sd(s, 2) for n, s in specs.items()})
            prefix_batch = {k: base[k].shape != dbl[k].shape for k in base}
            mb_shared_static = {
                k: (prefix_batch[k] if k in prefix_batch else is_batch[k])
                for k in al.shared_inputs}
            # canonical layer-input names are block 0's graph input names
            mb_ins_static = {canon: is_batch[canon]
                             for canon in al.layer_inputs}
            static_mb = (mb_ins_static, mb_shared_static)
        self._static_mb = static_mb
        b_in, b_out = self._b_in, self._b_out
        blk_in = plan.boundaries[0]
        blk_out = al.canonical.outputs[0]
        extra_names = list(al.extra_outputs)
        shared_names = list(al.shared_inputs)
        layer_in_names = list(al.layer_inputs)
        prefix_outs = [b_in] + plan.shared
        self_lps = lps
        M = self.microbatches

        def forward(params, inputs, stacked_ins):
            pre = prefix_fn(params["prefix"], inputs)
            h = pre[b_in]
            B = h.shape[0]
            if B % M:
                raise PipelineError(f"batch {B} % microbatches {M} != 0")
            microB = B // M
            h_micro = h.reshape((M, microB) + h.shape[1:])
            shared_vals = {k: (pre[k] if k in prefix_outs else inputs[k])
                           for k in shared_names}
            # static (trace-time) classification of microbatched leaves:
            # declared/probed batch semantics when available (static_mb),
            # else the legacy shape heuristic for external graphs built
            # without batch metadata (a per-layer input carries batch at
            # dim 1 after stacking, a shared input at dim 0)
            if static_mb is not None:
                mb_ins = {k: static_mb[0][k] for k in stacked_ins}
                mb_shared = {k: static_mb[1][k] for k in shared_vals}
            else:
                mb_ins = {k: v.ndim >= 2 and v.shape[1] == B
                          for k, v in stacked_ins.items()}
                mb_shared = {k: v.ndim >= 1 and v.shape[0] == B
                             for k, v in shared_vals.items()}

            # device-side GPipe schedule: every device runs the same
            # program, lax.axis_index picks its stage role; ppermute
            # shifts activations stage→stage+1 each step (zeros arrive at
            # stage 0, which ignores them and reads the next microbatch)
            def pipe(stage_xs, h_mb, shared_in):
                s = lax.axis_index(axis)
                xs = {
                    "params": stage_xs["params"],
                    "ins": {k: (v.reshape((v.shape[0], M, microB)
                                          + v.shape[2:]) if mb_ins[k] else v)
                            for k, v in stage_xs["ins"].items()},
                }
                shared_mb = {k: (v.reshape((M, microB) + v.shape[1:])
                                 if mb_shared[k] else v)
                             for k, v in shared_in.items()}

                def step(state, t):
                    m = jnp.clip(t - s, 0, M - 1)
                    inp = lax.dynamic_index_in_dim(
                        h_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False)
                    h_in = jnp.where(s == 0, inp, state)
                    feed_shared = {
                        k: (lax.dynamic_index_in_dim(v, m, 0, keepdims=False)
                            if mb_shared[k] else v)
                        for k, v in shared_mb.items()
                    }

                    def body(hh, xs_l):
                        feed = {blk_in: hh}
                        feed.update(feed_shared)
                        for k, v in xs_l["ins"].items():
                            # scan already stripped the layer axis, so the
                            # microbatch axis sits at dim 0 here
                            feed[k] = (lax.dynamic_index_in_dim(
                                v, m, 0, keepdims=False) if mb_ins[k] else v)
                        out = block_fn(xs_l["params"], feed)
                        return out[blk_out], {k: out[k] for k in extra_names}

                    # explicit length: with one layer per stage and all
                    # consts identical across layers, xs can be EMPTY
                    # (everything shared) and scan cannot infer it
                    h_out, extras = lax.scan(body, h_in, xs,
                                             length=self_lps)
                    nxt = lax.ppermute(h_out, axis,
                                       [(i, i + 1) for i in range(S - 1)])
                    return nxt, (h_out, extras)

                _, (h_steps, extra_steps) = lax.scan(
                    step, jnp.zeros_like(h_mb[0]), jnp.arange(M + S - 1))
                # last stage's steps [S-1, S-1+M) hold the real boundary
                # outputs; a masked psum replicates them (S-1 zero terms)
                h_win = lax.dynamic_slice_in_dim(h_steps, S - 1, M, 0)
                h_out = lax.psum(
                    h_win * (s == S - 1).astype(h_win.dtype), axis)

                # each stage's own valid window is steps [s, s+M): its
                # layers' extra outputs for microbatches 0..M-1, in order
                def window(v):  # [steps, lps, ...] → [lps, M, ...]
                    w = lax.dynamic_slice_in_dim(v, s, M, 0)
                    return jnp.moveaxis(w, 0, 1)

                return h_out, {k: window(v) for k, v in extra_steps.items()}

            # boundary replicated; extras keep their pipe sharding (dim 0
            # = stacked layer axis) so KV caches never leave their stage
            pipe_sm = jax.shard_map(
                pipe, mesh=mesh, in_specs=(P(axis), P(), P()),
                out_specs=(P(), P(axis)), check_vma=False)

            stage_xs = {"params": params["layers"], "ins": stacked_ins}
            h_out, extras = pipe_sm(stage_xs, h_micro, shared_vals)
            h_full = h_out.reshape(h.shape)
            out = suffix_fn(params["suffix"],
                            {b_out: h_full, **shared_vals, **inputs})
            # [n_layers, M, microB, ...] → [n_layers, B, ...]; the
            # layer-major reshape keeps the pipe sharding on dim 0.
            # Per-layer outputs must carry the batch dim (presents do).
            extras = {k: v.reshape((v.shape[0], B) + v.shape[3:])
                      for k, v in extras.items()}
            return out, extras

        cast = self._cast
        if cast is not None:
            raw_forward = forward

            def forward(params, inputs, stacked_ins):  # noqa: F811
                def c(d):
                    return {k: (v.astype(cast)
                                if v.dtype == jnp.float32 else v)
                            for k, v in d.items()}

                out, extras = raw_forward(params, c(inputs),
                                          c(stacked_ins))

                def u(d):
                    return {k: (v.astype(jnp.float32)
                                if v.dtype == cast else v)
                            for k, v in d.items()}

                return u(out), u(extras)

        self._fn = jax.jit(forward)

        def _put(arr, sharding):
            a = jnp.asarray(arr)
            if cast is not None and a.dtype == jnp.float32:
                a = a.astype(cast)
            return jax.device_put(a, sharding)

        # params live as jit ARGUMENTS (design invariant): stage weights
        # sharded on their stacked leading axis, prefix/suffix replicated
        rep = NamedSharding(mesh, P())
        stage_shard = NamedSharding(mesh, P(axis))
        self._stage_shard = stage_shard
        self.params = {
            "prefix": {k: _put(plan.prefix.constants[k], rep)
                       for k in plan.prefix.weight_names},
            # [n_layers, ...] stacked, leading axis over `pipe`: device s
            # holds rows [s*lps, (s+1)*lps) — its stage's layers only
            "layers": {k: _put(v, stage_shard)
                       for k, v in al.stacked.items()},
            "suffix": {k: _put(plan.suffix.constants[k], rep)
                       for k in plan.suffix.weight_names},
        }

    # -- call styles ----------------------------------------------------
    def stacked_call(self, inputs: Dict[str, jax.Array],
                     stacked_ins: Optional[Dict[str, jax.Array]] = None,
                     ) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
        """inputs: prefix/shared graph inputs; stacked_ins: per-layer
        inputs pre-stacked [n_layers, ...] under canonical names. Returns
        (suffix outputs, stacked extra outputs — pipe-sharded)."""
        inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        stacked_ins = {
            k: (v if getattr(v, "sharding", None) == self._stage_shard
                else jax.device_put(jnp.asarray(v), self._stage_shard))
            for k, v in (stacked_ins or {}).items()
        }
        missing = set(self.aligned.layer_inputs) - set(stacked_ins)
        if missing:
            raise PipelineError(f"missing stacked layer inputs: {missing}")
        with self.mesh:
            return self._fn(self.params, inputs, stacked_ins)

    def __call__(self, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        inputs = dict(inputs)
        stacked_ins = {}
        for canon, names in self.aligned.layer_inputs.items():
            stacked_ins[canon] = jnp.stack(
                [jnp.asarray(inputs.pop(n)) for n in names])
        inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        out, extras = self.stacked_call(inputs, stacked_ins)
        named = dict(out)
        for canon, names in self.aligned.extra_outputs.items():
            arr = extras[canon]
            for i, n in enumerate(names):
                named[n] = arr[i]
        return named

    @property
    def jitted(self):
        return self._fn
