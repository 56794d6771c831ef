"""Scan-over-layers decode graphs (gpt2/llama `scan_layers=True`).

The scan form emits the transformer stack as ONE ONNX Scan node over
stacked per-layer weights, lowered to a single `lax.scan` — collapsing the
per-step HLO op count from n_layer inlined blocks to one body (the decode
dispatch-gap fix, PERF.md "GPT-2 decode"). These tests pin the invariant
that makes it safe: the scan form is numerically interchangeable with the
per-layer form for every decode configuration we ship (fp32, INT8 KV
cache, INT4 weights + INT8 KV), for both decoder families.
"""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY as GPT2_TINY
from onnx_rusty_inference_engine_tpu.models.llama import TINY as LLAMA_TINY

rng = np.random.default_rng(11)

CONFIGS = [
    ("gpt2", {}),
    ("gpt2", {"kv_dtype": "int8"}),
    ("gpt2", {"kv_dtype": "int8", "int4_weights": True}),
    ("llama", {}),
    ("llama", {"kv_dtype": "int8"}),
    ("llama", {"kv_dtype": "int8", "int4_weights": True}),
]


@pytest.mark.parametrize("family,kwargs", CONFIGS,
                         ids=[f"{f}-{'-'.join(k) or 'fp32'}"
                              for f, k in CONFIGS])
def test_scan_decode_matches_per_layer(family, kwargs):
    cfg = GPT2_TINY if family == "gpt2" else LLAMA_TINY
    P, N = 4, 6
    ids = rng.integers(0, cfg.vocab_size, (2, P)).astype(np.int64)
    outs = {}
    for scan in (False, True):
        gen = Generator(cfg, batch=2, prompt_len=P, max_len=P + N,
                        family=family, scan_layers=scan, **kwargs)
        toks, logits = gen.generate(ids, N, return_logits=True)
        outs[scan] = (np.asarray(toks), np.concatenate(
            [np.asarray(l)[:, -1:] for l in logits], axis=1))
    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    # int4 packs per-layer then stacks — bit-identical math either way; the
    # scan vs inline forms may still reassociate fp accumulations slightly.
    np.testing.assert_allclose(outs[False][1], outs[True][1],
                               rtol=2e-4, atol=2e-4)


def test_scan_decode_stacked_cache_interface():
    """The scan graph exposes the stacked cache I/O contract that serving
    and sharding rely on: past_/present_ [n_layer, B, H, max_len, hd]."""
    cfg = GPT2_TINY
    gen = Generator(cfg, batch=1, prompt_len=2, max_len=8, family="gpt2",
                    scan_layers=True, kv_dtype="int8")
    ids = rng.integers(0, cfg.vocab_size, (1, 2)).astype(np.int64)
    toks, _ = gen.generate(ids, 3)
    assert np.asarray(toks).shape == (1, 3)
