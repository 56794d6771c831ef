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
    "extra": "Long-tail ops (trig, Lp, spectral, random, geometry)",
    "bounded": "Value-dependent-shape ops, static-bound convention "
               "(padded outputs, valid-first)",
    "fused": "com.oriet fused ops (Pallas kernels)",
}
ORDER = list(TITLES)


def main() -> None:
    mods = {}
    for (domain, op), fn in registry._REGISTRY.items():
        label = f"{op} ({domain})" if domain else op
        mods.setdefault(fn.__module__.split(".")[-1], []).append(label)

    lines = [
        "# Supported operator coverage",
        "",
        f"{len(registry._REGISTRY)} operators with lowering rules "
        "(`ops/registry.py`; unknown ops raise a clean `UnsupportedOpError`, "
        "vs the reference's panic at model_inference.rs:158-160). "
        "Generated from the registry — regenerate with "
        "`python docs/gen_ops.py`.",
        "",
    ]
    for m in ORDER + sorted(set(mods) - set(ORDER)):
        ops = sorted(mods.get(m, []))
        if not ops:
            continue
        lines += [f"## {TITLES.get(m, m)} ({len(ops)})", "",
                  ", ".join(f"`{o}`" for o in ops), ""]
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
        "- `Loop` with a data-dependent trip count or dynamic early-exit plus",
        "  per-trip scan outputs (data-dependent result length).",
        "- Dynamic (non-constant) `size`/`frame_step` for window/DFT/STFT ops,",
        "  dynamic `max_output_boxes_per_class` for NMS, dynamic Clip bounds",
        "  in the int8 path — each names the offending tensor in its error.",
        "- Training-only ops (gradients, optimizers): inference engine.",
        "",
    ]
    out = pathlib.Path(__file__).parent / "OPS.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out} ({len(registry._REGISTRY)} ops)")


if __name__ == "__main__":
    main()
