"""Token-level continuous batching for decoder models (GPT-2 family).

The LLM analog of serve.InferenceServer's request batching: ONE compiled
decode program over a fixed pool of B slots runs every step; finished
sequences free their slot and newly admitted prompts are prefetched into it
while the other slots keep generating. Per-slot cache offsets are native to
the decode graph (models/gpt2.build_gpt2_decode takes pos [B]), so admission
never recompiles or stalls resident sequences — the standard
continuous-batching serving design (vLLM-style scheduling, static-shape
XLA-friendly realization).

Mechanics
---------
- prompts are right-padded to the prefill graph's length; padded positions
  write garbage K/V beyond the true prompt, but the decode graph's per-slot
  validity mask (k <= pos) hides them, and each is overwritten by the step
  that reaches it — so results are EXACTLY the isolated-generation tokens
  (asserted in tests/test_serve_llm.py).
- inactive slots park at pos = max_len - 1: their cache row is rewritten by
  that same step's Where update before anything can attend to it, so they
  never corrupt state; their logits are ignored.
- the KV cache can be INT8 (kv_dtype="int8"): the decode graph carries the
  QDQ (see build_gpt2_decode), the server quantizes prefill K/V into the
  slot with the same per-head scales it feeds the graph.

Package map (split from the former 2,100-line serve_llm.py, round-4
verdict item 6 — zero behavior change, serve_llm re-exports):
  request.py      _Request + host/device token selection helpers
  base.py         _ServerBase (slot pool, dispatcher, lifecycle, stats)
  decode.py       DecodeServer (decoder-only continuous batching)
  decode_multi.py K-step device-resident dispatch bodies (mixin)
  seq2seq.py      Seq2SeqServer (encoder-decoder families)
  spec.py         SpeculativeServer (lossless speculative serving)
"""

from .decode import DecodeServer  # noqa: F401
from .seq2seq import Seq2SeqServer  # noqa: F401
from .spec import SpeculativeServer  # noqa: F401

__all__ = ["DecodeServer", "Seq2SeqServer", "SpeculativeServer"]
