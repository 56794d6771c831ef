"""Model family builders + asset zoo.

The reference bundles mnist-8.onnx and (nominally) squeezenet1.0-8.onnx; the
SqueezeNet blob is missing from its checkout (.MISSING_LARGE_BLOBS). These
builders synthesize ONNX ModelProtos for every north-star family offline —
SqueezeNet 1.0 (opset 8), ResNet-50, GPT-2 decoder — using the framework's
own protobuf writer, so the full ONNX ingest path is exercised end-to-end.
"""

from .squeezenet import build_squeezenet  # noqa: F401
from .resnet import build_resnet50  # noqa: F401
from .mobilenet import build_mobilenetv2  # noqa: F401
from .bert import build_bert  # noqa: F401
from .llama import build_llama  # noqa: F401
from .vit import build_vit  # noqa: F401
from .unet import build_unet  # noqa: F401
from .gpt2 import build_gpt2  # noqa: F401
from .t5 import build_t5_encoder, build_t5_decode  # noqa: F401
from .audio import build_audio_encoder  # noqa: F401
from .moe import build_moe  # noqa: F401
from .detection import build_detection  # noqa: F401
from .zoo import get_model_path, MODELS  # noqa: F401


def decoder_family(name: str):
    """(build_prefill, build_decode, supports_int8_kv) for a decoder family.

    Both families share the driver contract: prefill(input_ids [B,T]) ->
    logits + presents; decode(input_ids [B,1], pos [B], past_*) -> logits +
    presents with per-slot positions (continuous-batching-ready)."""
    if name == "gpt2":
        from .gpt2 import build_gpt2, build_gpt2_decode

        return build_gpt2, build_gpt2_decode, True
    if name == "llama":
        from .llama import build_llama, build_llama_decode

        return build_llama, build_llama_decode, True
    if name == "moe":
        from .moe import build_moe, build_moe_decode

        return build_moe, build_moe_decode, True
    raise KeyError(f"unknown decoder family {name!r}; have gpt2, llama, moe")
