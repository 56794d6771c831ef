"""Parser robustness: corrupt/truncated/random input must surface as ONE
typed exception — onnx_io.ModelParseError — from both the pure-Python wire
codec and the native C++ parser (differentially), never a raw numpy
ValueError / TypeError from parser internals.

(The reference panics inside the protobuf crate on malformed files; the
round-2 verdict repro'd raw ValueError/TypeError escaping our parser on a
truncated mnist-8 and on 4 KB of random bytes — this file locks the fix.)
"""

import os

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu import onnx_io
from onnx_rusty_inference_engine_tpu.native_loader import (
    get_lib,
    load_model_native,
)
from onnx_rusty_inference_engine_tpu.onnx_io import ModelParseError

REF_MNIST = "/root/reference/models/mnist-8.onnx"

rng = np.random.default_rng(1234)


def _mnist_bytes() -> bytes:
    with open(REF_MNIST, "rb") as f:
        return f.read()


def _parse_py(buf: bytes):
    """(ok, result_or_exc) through the Python wire codec."""
    try:
        return True, onnx_io.parse_model(buf)
    except ModelParseError as e:
        return False, e


def _parse_native(tmp_path, buf: bytes):
    """(status, result) via the C++ parser: 'ok' / 'reject' / 'unavail'."""
    p = tmp_path / "fuzz.onnx"
    p.write_bytes(buf)
    try:
        m = load_model_native(str(p))
    except ModelParseError as e:
        return "reject", e
    return ("unavail", None) if m is None else ("ok", m)


# ---------------------------------------------------------------------------
# the verdict's exact repros
# ---------------------------------------------------------------------------
def test_truncated_mnist_raises_typed_error(tmp_path):
    buf = _mnist_bytes()[: len(_mnist_bytes()) // 2]
    p = tmp_path / "trunc.onnx"
    p.write_bytes(buf)
    with pytest.raises(ModelParseError):
        onnx_io.load_model(str(p))


def test_random_bytes_raise_typed_error(tmp_path):
    buf = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    p = tmp_path / "random.onnx"
    p.write_bytes(buf)
    with pytest.raises(ModelParseError):
        onnx_io.load_model(str(p))


def test_error_message_names_the_file(tmp_path):
    p = tmp_path / "named.onnx"
    p.write_bytes(b"\xff" * 64)
    with pytest.raises(ModelParseError, match="named.onnx"):
        onnx_io.load_model(str(p))


def test_corrupt_tensor_pb_raises_typed_error(tmp_path):
    with open("/root/reference/mnist_data_0.pb", "rb") as f:
        buf = f.read()
    p = tmp_path / "trunc.pb"
    p.write_bytes(buf[: len(buf) - 7])  # raw_data no longer a multiple of 4
    with pytest.raises(ModelParseError):
        onnx_io.read_tensor_file(str(p))


# ---------------------------------------------------------------------------
# fuzz sweeps: ONLY ModelParseError may escape; a clean parse is also fine
# (truncating exactly at a top-level field boundary yields a valid prefix)
# ---------------------------------------------------------------------------
def _assert_parse_contract(buf: bytes):
    ok, res = _parse_py(buf)
    if ok:
        assert isinstance(res, onnx_io.ModelProto)


@pytest.mark.parametrize("frac", [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
def test_fuzz_truncations(frac):
    buf = _mnist_bytes()
    _assert_parse_contract(buf[: int(len(buf) * frac)])


def test_fuzz_byte_truncations_near_end():
    buf = _mnist_bytes()
    for cut in range(1, 40):
        _assert_parse_contract(buf[:-cut])


def test_fuzz_bit_flips():
    buf = bytearray(_mnist_bytes())
    for _ in range(64):
        i = int(rng.integers(0, len(buf)))
        bit = 1 << int(rng.integers(0, 8))
        buf[i] ^= bit
        _assert_parse_contract(bytes(buf))
        buf[i] ^= bit  # restore


def test_fuzz_random_buffers():
    for n in (0, 1, 16, 256, 4096):
        _assert_parse_contract(
            rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    _assert_parse_contract(b"\x00" * 1024)
    _assert_parse_contract(b"\xff" * 1024)


def test_huge_declared_dims_rejected_without_allocation():
    """A dataless TensorProto declaring absurd dims must error, not try to
    zero-fill exabytes."""
    from onnx_rusty_inference_engine_tpu.utils.protowire import WireWriter

    w = WireWriter()
    w.packed_varints(1, [1 << 50, 1 << 50])
    w.varint(2, onnx_io.FLOAT)
    w.string(8, "huge")
    with pytest.raises(ModelParseError):
        onnx_io.parse_tensor_proto(w.getvalue())


# ---------------------------------------------------------------------------
# differential: the C++ parser must agree with the Python one on every
# fuzzed buffer — same accept/reject decision, error surfaced (not None)
# ---------------------------------------------------------------------------
@pytest.mark.skipif(get_lib() is None, reason="native library unavailable")
def test_differential_native_vs_python(tmp_path):
    buf = _mnist_bytes()
    cases = [buf]
    cases += [buf[: int(len(buf) * f)]
              for f in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)]
    cases += [buf[:-c] for c in range(1, 20)]
    mut = bytearray(buf)
    for _ in range(32):
        i = int(rng.integers(0, len(mut)))
        mut[i] ^= 1 << int(rng.integers(0, 8))
        cases.append(bytes(mut))
        mut[i] ^= 1
    cases += [rng.integers(0, 256, n, dtype=np.uint8).tobytes()
              for n in (16, 256, 4096)]

    for idx, case in enumerate(cases):
        py_ok, py_res = _parse_py(case)
        nat_status, nat_res = _parse_native(tmp_path, case)
        if nat_status == "unavail":
            continue  # capability fallback (e.g. dtype gap) — not a verdict
        assert (nat_status == "ok") == py_ok, (
            f"case {idx}: python {'accepted' if py_ok else 'rejected'} but "
            f"native {'accepted' if nat_status == 'ok' else 'rejected'} "
            f"({py_res if not py_ok else nat_res})")
        if py_ok:
            assert len(nat_res.graph.nodes) == len(py_res.graph.nodes)


def test_valid_reference_models_still_load():
    m = onnx_io.load_model(REF_MNIST)
    assert len(m.graph.nodes) == 12
    t = onnx_io.read_tensor_file("/root/reference/mnist_data_0.pb")
    assert t.array.shape == (1, 1, 28, 28)
