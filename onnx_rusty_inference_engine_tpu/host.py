"""Host prolog: string/image ops executed in numpy BEFORE the XLA graph.

ONNX text pipelines (sklearn exports, tokenizer front-ends) begin with ops
over string tensors — StringNormalizer, TfIdfVectorizer, RegexFullMatch —
and some vision graphs embed ImageDecoder. XLA has no string dtype, so
these can never live inside the jitted program. Instead of rejecting such
models, the engine SPLITS them: a maximal host-executable prefix (every op
that is inherently host-bound, plus anything consuming a string value)
runs eagerly in numpy at call time, and its numeric products feed the
single jitted device function as extra inputs. This is the hybrid
host/device analog of the design invariant "whole graph = ONE jitted
f(params, inputs)" — the device part still is.

The reference engine has no string support at all (fp32-only tensor
reader, src/inference_engine/utils.rs:128-142).

Boundary rules:
  * host → device tensors must be numeric (a string flowing into a
    non-host op is a model error, reported as UnsupportedOpError);
  * device → host edges are illegal by construction (host nodes form a
    prefix: any node consuming a host value is itself hosted, and host
    ops never consume device-computed values since their sources are
    graph inputs/constants — enforced with a clear error otherwise).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from .graph import Graph, InputSpec, Node
from .ops.registry import UnsupportedOpError

# ops that can ONLY run on host (string semantics or byte-stream decode)
_HOST_EMITTERS: Dict[str, Callable] = {}


def host_op(*names):
    def deco(fn):
        for n in names:
            _HOST_EMITTERS[n] = fn
        return fn
    return deco


def is_string_array(v) -> bool:
    return isinstance(v, np.ndarray) and (v.dtype == object
                                          or v.dtype.kind == "U")


# --------------------------------------------------------------------------
# emitters (numpy, eager)
# --------------------------------------------------------------------------
@host_op("StringConcat")
def _string_concat(node: Node, ins):
    concat = np.frompyfunc(lambda a, b: str(a) + str(b), 2, 1)
    return [concat(ins[0], ins[1])]


@host_op("RegexFullMatch")
def _regex_full_match(node: Node, ins):
    pattern = node.attr("pattern")
    if pattern is None:
        raise UnsupportedOpError("RegexFullMatch: pattern attribute required")
    try:
        rx = re.compile(pattern)
    except re.error as e:
        raise UnsupportedOpError(f"RegexFullMatch: bad pattern: {e}") from e
    x = np.asarray(ins[0])
    out = np.array([rx.fullmatch(str(s)) is not None for s in x.ravel()],
                   dtype=np.bool_)
    return [out.reshape(x.shape)]


@host_op("StringSplit")
def _string_split(node: Node, ins):
    delim = node.attr("delimiter")
    maxsplit = node.attr("maxsplit")
    x = np.asarray(ins[0])
    ms = -1 if maxsplit is None else int(maxsplit)
    # empty/absent delimiter = whitespace mode: runs collapse, blanks give
    # no tokens (str.split(None) semantics, which is what the spec asks)
    parts: List[List[str]] = [
        str(s).split(delim if delim else None, ms) for s in x.ravel()
    ]
    width = max((len(p) for p in parts), default=0)
    y = np.empty((len(parts), width), dtype=object)
    y[:] = ""
    for i, p in enumerate(parts):
        y[i, :len(p)] = p
    z = np.array([len(p) for p in parts], dtype=np.int64)
    return [y.reshape(x.shape + (width,)), z.reshape(x.shape)]


@host_op("StringNormalizer")
def _string_normalizer(node: Node, ins):
    action = node.attr("case_change_action", "NONE")
    case_sensitive = bool(node.attr("is_case_sensitive", 0))
    stopwords = node.attr("stopwords") or []
    x = np.asarray(ins[0])
    if x.ndim not in (1, 2) or (x.ndim == 2 and x.shape[0] != 1):
        raise UnsupportedOpError(
            f"StringNormalizer: input must be [C] or [1,C], got {x.shape}")
    row = [str(s) for s in x.ravel()]
    if stopwords:
        if case_sensitive:
            drop = set(stopwords)
            row = [s for s in row if s not in drop]
        else:
            drop = {w.lower() for w in stopwords}
            row = [s for s in row if s.lower() not in drop]
    if action == "LOWER":
        row = [s.lower() for s in row]
    elif action == "UPPER":
        row = [s.upper() for s in row]
    if not row:
        row = [""]  # spec: empty result collapses to a single empty string
    out = np.array(row, dtype=object)
    return [out.reshape((1, -1)) if x.ndim == 2 else out]


@host_op("ImageDecoder")
def _image_decoder(node: Node, ins):
    import io

    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL is in the image
        raise UnsupportedOpError("ImageDecoder requires PIL") from e
    fmt = node.attr("pixel_format", "RGB")
    data = np.asarray(ins[0], dtype=np.uint8).tobytes()
    try:
        img = Image.open(io.BytesIO(data))
        img = img.convert("L" if fmt == "Grayscale" else "RGB")
    except Exception as e:
        raise UnsupportedOpError(f"ImageDecoder: cannot decode: {e}") from e
    arr = np.asarray(img, dtype=np.uint8)
    if fmt == "Grayscale":
        return [arr[..., None]]
    if fmt == "BGR":
        return [arr[..., ::-1]]
    return [arr]


@host_op("TfIdfVectorizer")
def _tfidf_vectorizer(node: Node, ins):
    mode = node.attr("mode", "TF")
    min_n = int(node.attr("min_gram_length", 1))
    max_n = int(node.attr("max_gram_length", 1))
    max_skip = int(node.attr("max_skip_count", 0))
    ngram_counts = [int(v) for v in node.attr("ngram_counts", [])]
    ngram_indexes = [int(v) for v in node.attr("ngram_indexes", [])]
    weights = node.attr("weights")
    pool = node.attr("pool_strings")
    if pool is None:
        pool = [int(v) for v in node.attr("pool_int64s", [])]
    else:
        pool = [str(s) for s in pool]

    # pool layout: ngram_counts[i] = offset of the (i+1)-gram block; the
    # k-th ngram overall maps to output column ngram_indexes[k]
    gram_to_col: Dict[Tuple, int] = {}
    k = 0
    for i, start in enumerate(ngram_counts):
        n = i + 1
        end = ngram_counts[i + 1] if i + 1 < len(ngram_counts) else len(pool)
        for j in range((end - start) // max(n, 1)):
            gram = tuple(pool[start + j * n: start + (j + 1) * n])
            gram_to_col[gram] = ngram_indexes[k]
            k += 1
    n_cols = max(ngram_indexes) + 1 if ngram_indexes else 0

    x = np.asarray(ins[0])
    rows = x.reshape(1, -1) if x.ndim <= 1 else x
    if x.ndim > 2:
        raise UnsupportedOpError(
            f"TfIdfVectorizer: rank-{x.ndim} input not in spec")
    counts = np.zeros((rows.shape[0], n_cols), dtype=np.float32)
    for b in range(rows.shape[0]):
        row = [str(t) if is_string_array(x) else int(t) for t in rows[b]]
        for n in range(min_n, max_n + 1):
            # skip-grams: uniform stride s+1 between items (1-grams never skip)
            for s in range(0, (max_skip if n > 1 else 0) + 1):
                stride = s + 1
                span = (n - 1) * stride
                for i0 in range(0, len(row) - span):
                    gram = tuple(row[i0 + t * stride] for t in range(n))
                    col = gram_to_col.get(gram)
                    if col is not None:
                        counts[b, col] += 1.0
    if mode in ("IDF", "TFIDF"):
        w = np.ones(n_cols, dtype=np.float32)
        if weights is not None:
            for kk, col in enumerate(ngram_indexes):
                w[col] = weights[kk]
        counts = (counts > 0).astype(np.float32) * w if mode == "IDF" \
            else counts * w
    out = counts if x.ndim == 2 else counts.reshape(-1)
    return [out]


# --------------------------------------------------------------------------
# partition + execution
# --------------------------------------------------------------------------
class HostProlog:
    """The host-executable prefix of a graph: nodes run eagerly in numpy."""

    def __init__(self, nodes: List[Node], constants: Dict[str, np.ndarray],
                 boundary: List[str], host_outputs: List[str],
                 consumed_inputs: List[str], orig_input_names: List[str]):
        self.nodes = nodes
        self.constants = constants
        self.boundary = boundary          # host-produced, device-consumed
        self.host_outputs = host_outputs  # graph outputs produced on host
        self.consumed_inputs = consumed_inputs  # graph inputs host consumes
        self.orig_input_names = orig_input_names  # pre-split feed order

    def run(self, feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        env: Dict[str, np.ndarray] = dict(self.constants)
        env.update({k: np.asarray(v) for k, v in feeds.items()})
        for node in self.nodes:
            fn = _HOST_EMITTERS.get(node.op_type)
            if fn is None:
                raise UnsupportedOpError(
                    f"op '{node.op_type}' consumes a string value but has "
                    f"no host (numpy) implementation")
            missing = [i for i in node.inputs if i and i not in env]
            if missing:
                raise UnsupportedOpError(
                    f"host op '{node.op_type}' reads device-computed "
                    f"tensors {missing}; device→host edges are not "
                    f"supported (host ops must form a graph prefix)")
            outs = fn(node, [env[i] if i else None for i in node.inputs])
            for name, val in zip(node.outputs, outs):
                if name:
                    env[name] = val
        out = {}
        for name in self.boundary + self.host_outputs:
            v = env[name]
            if name in self.boundary and is_string_array(v):
                raise UnsupportedOpError(
                    f"tensor {name!r} is a string value consumed by a "
                    f"device op — no XLA lowering exists for strings")
            out[name] = v
        return out


def split_host_prolog(graph: Graph) -> Tuple[Optional[HostProlog], Graph]:
    """Partition `graph` into (host prolog, device graph).

    A node is hosted iff its op is host-only (string/byte semantics) or it
    consumes a hosted value / string constant / string graph input. Host
    products consumed by device nodes become extra device inputs (shape
    dynamic — jit retraces per shape, like any shape-polymorphic feed)."""
    string_vals = {k for k, v in graph.constants.items()
                   if is_string_array(v)}
    string_vals |= {s.name for s in graph.inputs if s.dtype == object}
    if not string_vals and not any(n.op_type in _HOST_EMITTERS
                                   for n in graph.nodes):
        return None, graph

    # which host-op outputs are string-valued (and so recruit their
    # consumers onto the host); numeric host products instead become
    # boundary tensors feeding the device graph
    string_outs = {
        "StringConcat": (True,), "StringNormalizer": (True,),
        "StringSplit": (True, False), "RegexFullMatch": (False,),
        "ImageDecoder": (False,), "TfIdfVectorizer": (False,),
    }

    hosted_vals = set(string_vals)
    host_nodes: List[Node] = []
    device_nodes: List[Node] = []
    for node in graph.nodes:
        if node.op_type in _HOST_EMITTERS or any(
                i in hosted_vals for i in node.inputs if i):
            host_nodes.append(node)
            flags = string_outs.get(node.op_type)
            for idx, o in enumerate(node.outputs):
                # unknown op hosting a string (will error in run()) marks
                # all outputs string so the poisoning is visible downstream
                if o and (flags is None or (idx < len(flags)
                                            and flags[idx])):
                    hosted_vals.add(o)
        else:
            device_nodes.append(node)
    if not host_nodes:
        return None, graph

    produced = {o for n in host_nodes for o in n.outputs if o}
    boundary = sorted({
        i for n in device_nodes for i in n.inputs if i and i in produced})
    host_outputs = [o for o in graph.outputs if o in produced]
    device_outputs = [o for o in graph.outputs if o not in produced]

    host_consts = {k: v for k, v in graph.constants.items()
                   if any(k in n.inputs for n in host_nodes)}
    consumed = [s.name for s in graph.inputs
                if any(s.name in n.inputs for n in host_nodes)]
    # inputs consumed ONLY by host nodes leave the device signature
    device_needed = {i for n in device_nodes for i in n.inputs if i}
    device_inputs = [s for s in graph.inputs
                     if s.name in device_needed or s.name not in set(consumed)]
    device_inputs = device_inputs + [
        InputSpec(name=b, shape=(), dtype=np.dtype(np.float32))
        for b in boundary]

    dev_graph = dataclasses.replace(
        graph,
        nodes=device_nodes,
        inputs=device_inputs,
        outputs=device_outputs,
        constants={k: v for k, v in graph.constants.items()
                   if not is_string_array(v)},
        weight_names=[w for w in graph.weight_names
                      if not is_string_array(graph.constants[w])],
    )
    prolog = HostProlog(host_nodes, host_consts, boundary, host_outputs,
                        consumed, list(graph.input_names))
    return prolog, dev_graph
