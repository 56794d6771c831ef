"""Regenerate docs/OPS.md from the lowering registry.

Run: python docs/gen_ops.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import onnx_rusty_inference_engine_tpu.ops  # noqa: F401,E402  (registrations)
from onnx_rusty_inference_engine_tpu.ops import registry  # noqa: E402

TITLES = {
    "standard": "Standard ONNX ops (opset ≤ 23)",
    "quantized": "Quantized ops (QLinear / integer / INT4)",
    "rnn": "Recurrent ops (lax.scan)",
    "control_flow": "Control flow (lax.cond / lax.scan, subgraph closures)",
    "contrib_transformers": "ORT contrib ops (com.microsoft)",
    "core_attention": "Core-domain attention ops (ai.onnx opset 23)",
    "extra": "Long-tail ops (trig, Lp, spectral, random, geometry)",
    "bounded": "Value-dependent-shape ops, static-bound convention "
               "(padded outputs, valid-first)",
    "fused": "com.oriet fused ops (Pallas kernels)",
    "sequences": "Sequence / Optional ops (trace-time structure, "
                 "dynamic elements)",
    "losses": "Loss ops (one-hot pick, gather-free)",
    "vision_roi": "RoI / deformable ops (weight-matrix sampling on the MXU)",
    "ml": "ai.onnx.ml classical-ML ops (GEMM tree ensembles, kernel-matmul "
          "SVMs; sklearn exports)",
}
ORDER = list(TITLES)


def main() -> None:
    from onnx_rusty_inference_engine_tpu import host

    mods = {}
    for (domain, op), fn in registry._REGISTRY.items():
        label = f"{op} ({domain})" if domain else op
        mods.setdefault(fn.__module__.split(".")[-1], []).append(label)

    host_only = (set(host._HOST_EMITTERS) | set(host._EPILOG_EMITTERS)) \
        - {op for (_, op) in registry._REGISTRY}
    n_total = len(registry._REGISTRY) + len(host_only)
    lines = [
        "# Supported operator coverage",
        "",
        f"{n_total} operators: {len(registry._REGISTRY)} XLA lowering rules "
        f"(`ops/registry.py`) plus {len(host_only)} host-only ops "
        "(`host.py` — string/image front-ends numpy-executed before the "
        "jitted graph, and map/string tails like ZipMap after it). "
        "Unknown ops raise a clean `UnsupportedOpError` "
        "vs the reference's panic at model_inference.rs:158-160. "
        "Generated from the registries — regenerate with "
        "`python docs/gen_ops.py`.",
        "",
        "Coverage is the COMPLETE ai.onnx core opset (every op in the "
        "default-domain spec has a rule) plus the ai.onnx.ml domain and "
        "contrib/fused extensions. This claim is MACHINE-CHECKED: "
        "`tests/test_opset_complete.py` diffs the live registry + host-op "
        "tables against the checked-in spec lists "
        "(`docs/spec_ops_ai_onnx.txt`, `docs/spec_ops_ai_onnx_ml.txt`) in "
        "both directions; the only intentional exclusion is the deprecated "
        "ai.onnx.ml `CastMap`.",
        "",
    ]
    for m in ORDER + sorted(set(mods) - set(ORDER)):
        ops = sorted(mods.get(m, []))
        if not ops:
            continue
        lines += [f"## {TITLES.get(m, m)} ({len(ops)})", "",
                  ", ".join(f"`{o}`" for o in ops), ""]
    lines += [
        f"## Host-prolog ops (host.py) ({len(host._HOST_EMITTERS)})",
        "",
        ", ".join(f"`{o}`" for o in sorted(host._HOST_EMITTERS)),
        "",
        "String/byte-stream semantics have no XLA dtype; these execute in",
        "numpy as a graph PREFIX whose numeric products feed the single",
        "jitted device function (hybrid host/device split, `host.py`).",
        "",
        f"## Host-epilog ops (host.py) ({len(host._EPILOG_EMITTERS)})",
        "",
        ", ".join(f"`{o}`" for o in sorted(host._EPILOG_EMITTERS)),
        "",
        "Map outputs and numeric→string tails (sklearn classifier exports)",
        "run AFTER the jitted graph on its (tiny) outputs; string-keyed",
        "variants of the same ops run in the PROLOG when fed string inputs",
        "(`fallback_op`). String-labelled classifiers stay on device",
        "emitting the argmax index; the epilog maps index → label.",
        "",
    ]
    lines += [
        "## Static-bound convention (ops/bounded.py)",
        "",
        "`NonZero`, `Unique`, `Compress`, `NonMaxSuppression` have",
        "value-dependent output shapes; they lower with ORT/TF-Lite-style",
        "static bounds: outputs padded to the worst case (input extent, or",
        "NMS `max_output_boxes_per_class`), valid entries first in spec",
        "order, documented padding sentinels (0; -1 rows for NMS).",
        "",
        "## Known unsupported (clean `UnsupportedOpError`, documented reasons)",
        "",
        "- `Unique` with the `axis` attribute (unique subtensors).",
        "- `CastMap` (ai.onnx.ml): deprecated; consumes a map produced only",
        "  by the deprecated map-output SVM/Tree forms — no exporter emits",
        "  it. `TreeEnsemble` v5 `BRANCH_MEMBER` (set-membership",
        "  splits) has no dense lowering yet.",
        "- `Loop` with a data-dependent trip count or dynamic early-exit plus",
        "  per-trip scan outputs (data-dependent result length).",
        "- Dynamic (non-constant) `size`/`frame_step` for window/DFT/STFT ops,",
        "  dynamic `max_output_boxes_per_class` for NMS, dynamic Clip bounds",
        "  in the int8 path — each names the offending tensor in its error.",
        "- Dynamic positions for `SequenceInsert`/`SequenceErase` (they change",
        "  the static list structure); dynamic `SequenceAt` over sequences",
        "  with heterogeneous element shapes.",
        "- `RoiAlign` with `sampling_ratio=0` (adaptive, data-dependent grid)",
        "  when the rois are runtime tensors.",
        "- Training-only ops (gradients, optimizers): inference engine.",
        "",
    ]
    out = pathlib.Path(__file__).parent / "OPS.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out} ({n_total} ops: {len(registry._REGISTRY)} XLA "
          f"+ {len(host_only)} host-only)")


if __name__ == "__main__":
    main()
