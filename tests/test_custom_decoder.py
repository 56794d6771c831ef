"""Bring-your-own ONNX decoder (custom_decoder.py): externally-produced
prefill/decode ONNX files plug into Generator and DecodeServer via
register_decoder_family, with optional tensor renaming for exports that
use foreign I/O names (HF-style past_key_values.0.key)."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu import onnx_io
from onnx_rusty_inference_engine_tpu.custom_decoder import (
    onnx_decoder_family,
    rename_tensors,
)
from onnx_rusty_inference_engine_tpu.generate import Generator
from onnx_rusty_inference_engine_tpu.graph import (
    export_model,
    import_model,
)
from onnx_rusty_inference_engine_tpu.models import (
    decoder_family,
    register_decoder_family,
)
from onnx_rusty_inference_engine_tpu.models.gpt2 import (
    TINY,
    build_gpt2,
    build_gpt2_decode,
)
from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

rng = np.random.default_rng(17)


def _write(tmp_path, batch, prompt_len, max_len, rename=None):
    """Export the gpt2 builders' graphs to ONNX FILES (the external-
    artifact simulation: same wire format any exporter produces)."""
    pg = import_model(build_gpt2(TINY, batch=batch, seq_len=prompt_len,
                                 past_len=0, with_presents=True))
    dg = import_model(build_gpt2_decode(TINY, batch=batch,
                                        max_len=max_len))
    if rename:
        pg, dg = rename_tensors(pg, rename), rename_tensors(dg, rename)
    pp = str(tmp_path / "prefill.onnx")
    dp = str(tmp_path / "decode.onnx")
    onnx_io.save_model(pp, export_model(pg))
    onnx_io.save_model(dp, export_model(dg))
    return pp, dp


def test_custom_family_matches_native(tmp_path):
    pp, dp = _write(tmp_path, batch=2, prompt_len=4, max_len=12)
    register_decoder_family("ext-gpt2", *onnx_decoder_family(pp, dp))
    ids = rng.integers(0, TINY.vocab_size, (2, 4)).astype(np.int64)
    want, _ = Generator(TINY, batch=2, prompt_len=4,
                        max_len=12).generate(ids, 6)
    got, _ = Generator(TINY, batch=2, prompt_len=4, max_len=12,
                       family="ext-gpt2").generate(ids, 6)
    np.testing.assert_array_equal(got, want)


def test_foreign_names_remap(tmp_path):
    """Files exported with HF-style cache names serve after rename=."""
    fwd = {}
    for i in range(TINY.n_layer):
        for kind in ("key", "value"):
            fwd[f"past_{kind}_{i}"] = f"past_key_values.{i}.{kind}"
            fwd[f"present_{kind}_{i}"] = f"present.{i}.{kind}"
    fwd["pos"] = "position_ids"
    pp, dp = _write(tmp_path, batch=1, prompt_len=4, max_len=12,
                    rename=fwd)
    back = {v: k for k, v in fwd.items()}
    register_decoder_family(
        "hf-ish", *onnx_decoder_family(pp, dp, rename=back))
    ids = rng.integers(0, TINY.vocab_size, (1, 4)).astype(np.int64)
    want, _ = Generator(TINY, batch=1, prompt_len=4,
                        max_len=12).generate(ids, 5)
    got, _ = Generator(TINY, batch=1, prompt_len=4, max_len=12,
                       family="hf-ish").generate(ids, 5)
    np.testing.assert_array_equal(got, want)


def test_custom_family_serves(tmp_path):
    """DecodeServer drives a file-backed family: batch-1 prefill file +
    batch-slots decode file, served == isolated."""
    slots, plen, mlen = 2, 4, 16
    pg = import_model(build_gpt2(TINY, batch=1, seq_len=plen, past_len=0,
                                 with_presents=True))
    dg = import_model(build_gpt2_decode(TINY, batch=slots, max_len=mlen))
    pp, dp = str(tmp_path / "p.onnx"), str(tmp_path / "d.onnx")
    onnx_io.save_model(pp, export_model(pg))
    onnx_io.save_model(dp, export_model(dg))
    register_decoder_family("ext-served", *onnx_decoder_family(pp, dp))

    srv = DecodeServer(TINY, slots=slots, prompt_len=plen, max_len=mlen,
                       family="ext-served")
    try:
        p = rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
        got = srv.submit(p, 5).result(timeout=300)
    finally:
        srv.stop()
    want, _ = Generator(TINY, batch=1, prompt_len=4,
                        max_len=mlen).generate(p[None], 5)
    assert got == list(want[0])


def test_shape_mismatch_raises(tmp_path):
    pp, dp = _write(tmp_path, batch=2, prompt_len=4, max_len=12)
    register_decoder_family("ext-shape", *onnx_decoder_family(pp, dp))
    with pytest.raises(ValueError, match="re-export"):
        Generator(TINY, batch=4, prompt_len=4, max_len=12,
                  family="ext-shape")


def test_missing_contract_input_raises(tmp_path):
    pp, dp = _write(tmp_path, batch=1, prompt_len=4, max_len=12,
                    rename={"pos": "position_ids"})
    register_decoder_family("ext-noctr", *onnx_decoder_family(pp, dp))
    with pytest.raises(ValueError, match="no input 'pos'"):
        Generator(TINY, batch=1, prompt_len=4, max_len=12,
                  family="ext-noctr")


def test_builtin_families_not_overridable():
    with pytest.raises(ValueError, match="built-in"):
        register_decoder_family("gpt2", None, None)


def test_unknown_family_lists_custom():
    with pytest.raises(KeyError, match="ext-gpt2|gpt2"):
        decoder_family("definitely-not-registered")
