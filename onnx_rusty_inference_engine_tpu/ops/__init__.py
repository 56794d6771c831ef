"""Operator lowering rules (op_type → JAX emitter) and Pallas kernels."""

from .registry import (  # noqa: F401
    LoweringContext,
    UnsupportedOpError,
    get_emitter,
    register,
    supported_ops,
)

# Importing these modules populates the registry.
from . import standard  # noqa: F401,E402
from . import quantized  # noqa: F401,E402
from . import rnn  # noqa: F401,E402
from . import control_flow  # noqa: F401,E402
from . import contrib_transformers  # noqa: F401,E402
from . import core_attention  # noqa: F401,E402
from . import extra  # noqa: F401,E402
from . import fused  # noqa: F401,E402
from . import bounded  # noqa: F401,E402
from . import sequences  # noqa: F401,E402
from . import losses  # noqa: F401,E402
from . import vision_roi  # noqa: F401,E402
from . import ml  # noqa: F401,E402
