"""Compatibility shim: the serving stack now lives in the serving/
package (request/base/decode/decode_multi/seq2seq/spec) — this module
keeps every existing `from ...serve_llm import X` working."""

from .serving import (  # noqa: F401
    DecodeServer,
    Seq2SeqServer,
    SpeculativeServer,
)
from .serving.base import _ServerBase  # noqa: F401
from .serving.request import (  # noqa: F401
    _Request,
    _bias_penalize,
    _device_select,
    _fetch,
    _hits_stop,
    _select_token,
)

__all__ = ["DecodeServer", "Seq2SeqServer", "SpeculativeServer"]
