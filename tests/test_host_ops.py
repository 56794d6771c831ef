"""Host-prolog ops (string/image front-ends executed in numpy before the
jitted graph): StringConcat/Split/Normalizer, RegexFullMatch, ImageDecoder,
TfIdfVectorizer — plus the hybrid host→device boundary and the string
tensor wire codec."""

import io

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu import onnx_io
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.ops.registry import UnsupportedOpError
from util import make_model, node, run_op

rng = np.random.default_rng(61)


def _s(*vals, shape=None):
    a = np.empty(len(vals), dtype=object)
    a[:] = list(vals)
    return a.reshape(shape) if shape else a


def test_string_tensor_codec_roundtrip():
    arr = _s("hello", "wörld", "", "a,b,c", shape=(2, 2))
    buf = onnx_io.encode_tensor_proto("t", arr)
    back = onnx_io.parse_tensor_proto(buf)
    assert back.array.shape == (2, 2)
    assert back.array.dtype == object
    assert list(back.array.ravel()) == ["hello", "wörld", "", "a,b,c"]


def test_string_concat_broadcast():
    x = _s("ab", "cd", shape=(2, 1))
    y = _s("X", "Y", "Z", shape=(1, 3))
    (got,) = run_op("StringConcat", {"x": x, "y": y})
    assert got.shape == (2, 3)
    assert got[0, 1] == "abY" and got[1, 2] == "cdZ"


def test_regex_full_match():
    x = _s("cat", "catalog", "concat", "Cat")
    (got,) = run_op("RegexFullMatch", {"x": x}, pattern=r"cat|.*g")
    np.testing.assert_array_equal(got, [True, True, False, False])


def test_string_split_delimiter_and_whitespace():
    x = _s("a,b,,c", "", "x,y")
    y, z = run_op("StringSplit", {"x": x}, n_outputs=2, delimiter=",")
    assert y.shape == (3, 4)
    assert list(y[0]) == ["a", "b", "", "c"]
    assert list(z) == [4, 1, 2]
    x2 = _s("  hello   world ", "one")
    y2, z2 = run_op("StringSplit", {"x": x2}, n_outputs=2)
    assert list(y2[0]) == ["hello", "world"]
    assert list(z2) == [2, 1]
    # maxsplit caps the number of splits, remainder stays joined
    y3, z3 = run_op("StringSplit", {"x": _s("a-b-c-d")}, n_outputs=2,
                    delimiter="-", maxsplit=2)
    assert list(y3[0]) == ["a", "b", "c-d"] and z3[0] == 3


def test_string_normalizer():
    x = _s("The", "cat", "AND", "dog", shape=(1, 4))
    (got,) = run_op("StringNormalizer", {"x": x},
                    case_change_action="LOWER",
                    stopwords=["the", "and"], is_case_sensitive=0)
    assert got.shape == (1, 2)
    assert list(got[0]) == ["cat", "dog"]
    # case-sensitive: "The" != "the" stopword, survives
    (got2,) = run_op("StringNormalizer", {"x": _s("The", "the", "cat")},
                     case_change_action="UPPER",
                     stopwords=["the"], is_case_sensitive=1)
    assert list(got2) == ["THE", "CAT"]
    # everything removed → single empty string (spec collapse)
    (got3,) = run_op("StringNormalizer", {"x": _s("a", "a")},
                     stopwords=["a"], is_case_sensitive=1)
    assert list(got3) == [""]


def test_image_decoder_formats():
    from PIL import Image

    img = Image.fromarray(
        rng.integers(0, 255, (5, 7, 3), dtype=np.uint8), "RGB")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    enc = np.frombuffer(buf.getvalue(), dtype=np.uint8).copy()
    want = np.asarray(img, dtype=np.uint8)

    (rgb,) = run_op("ImageDecoder", {"x": enc}, pixel_format="RGB")
    np.testing.assert_array_equal(rgb, want)
    (bgr,) = run_op("ImageDecoder", {"x": enc}, pixel_format="BGR")
    np.testing.assert_array_equal(bgr, want[..., ::-1])
    (grey,) = run_op("ImageDecoder", {"x": enc}, pixel_format="Grayscale")
    assert grey.shape == (5, 7, 1)


def _tfidf_attrs(**over):
    base = dict(
        min_gram_length=1, max_gram_length=2, max_skip_count=0,
        ngram_counts=[0, 2], ngram_indexes=[0, 1, 2],
        pool_strings=["a", "b", "a", "c"],  # 1-grams a,b; bigram (a,c)
    )
    base.update(over)
    return base


def test_tfidf_strings_tf():
    x = _s("a", "b", "a", "c", shape=(1, 4))
    (got,) = run_op("TfIdfVectorizer", {"x": x}, mode="TF", **_tfidf_attrs())
    np.testing.assert_allclose(got, [[2.0, 1.0, 1.0]])


def test_tfidf_skipgrams_and_modes():
    # skip=1 adds stride-2 bigrams: (a,a) from positions 0,2 — pool lacks
    # it; (b,c) from 1,3 — also absent; counts unchanged
    x = _s("a", "b", "a", "c", shape=(1, 4))
    (got,) = run_op("TfIdfVectorizer", {"x": x}, mode="TF",
                    **_tfidf_attrs(max_skip_count=1))
    np.testing.assert_allclose(got, [[2.0, 1.0, 1.0]])
    (idf,) = run_op("TfIdfVectorizer", {"x": x}, mode="IDF",
                    **_tfidf_attrs(weights=[0.5, 2.0, 3.0]))
    np.testing.assert_allclose(idf, [[0.5, 2.0, 3.0]])
    (tfidf,) = run_op("TfIdfVectorizer", {"x": x}, mode="TFIDF",
                      **_tfidf_attrs(weights=[0.5, 2.0, 3.0]))
    np.testing.assert_allclose(tfidf, [[1.0, 2.0, 3.0]])


def test_tfidf_int64_pool_1d():
    x = np.array([3, 5, 3, 9], dtype=np.int64)
    (got,) = run_op("TfIdfVectorizer", {"x": x}, mode="TF",
                    min_gram_length=1, max_gram_length=2, max_skip_count=0,
                    ngram_counts=[0, 2], ngram_indexes=[0, 1, 2],
                    pool_int64s=[3, 5, 3, 9])
    np.testing.assert_allclose(got, [2.0, 1.0, 1.0])  # 1-D in, 1-D out


def test_hybrid_host_to_device():
    """strings → TfIdf (host) → MatMul (device): the boundary tensor feeds
    the jitted graph as a runtime input."""
    x = _s("a", "b", "a", "c", shape=(1, 4))
    w = rng.standard_normal((3, 2)).astype(np.float32)
    m = make_model(
        [node("TfIdfVectorizer", ["x"], ["feats"], mode="TF",
              **_tfidf_attrs()),
         node("MatMul", ["feats", "w"], ["out"])],
        {"x": x}, ["out"], {"w": w})
    m2 = onnx_io.parse_model(onnx_io.serialize_model(m))
    eng = Engine(import_model(m2))
    got = eng.run({"x": x}).outputs["out"]
    np.testing.assert_allclose(got, np.array([[2.0, 1.0, 1.0]]) @ w,
                               rtol=1e-5)
    # second call with different content reuses the compiled device fn
    x2 = _s("b", "b", "b", "q", shape=(1, 4))
    got2 = eng.run({"x": x2}).outputs["out"]
    np.testing.assert_allclose(got2, np.array([[0.0, 3.0, 0.0]]) @ w,
                               rtol=1e-5)


def test_pure_host_pipeline_and_string_output():
    """normalizer → concat, no device nodes at all; string graph output."""
    x = _s("The", "Cat")
    m = make_model(
        [node("StringNormalizer", ["x"], ["norm"],
              case_change_action="UPPER"),
         node("StringConcat", ["norm", "suffix"], ["out"])],
        {"x": x}, ["out"], {"suffix": _s("!", "!")})
    m2 = onnx_io.parse_model(onnx_io.serialize_model(m))
    out = Engine(import_model(m2)).run({"x": x}).outputs["out"]
    assert list(out) == ["THE!", "CAT!"]


def test_string_into_device_op_rejected():
    x = _s("a", "b")
    m = make_model([node("Relu", ["x"], ["out"])], {"x": x}, ["out"])
    m2 = onnx_io.parse_model(onnx_io.serialize_model(m))
    with pytest.raises(UnsupportedOpError, match="no host"):
        Engine(import_model(m2)).run({"x": x})


# ---------------------------------------------------------------------------
# DictVectorizer (ai.onnx.ml) — map input -> dense feature vector
# ---------------------------------------------------------------------------
def _d(v):
    a = np.empty((), dtype=object)
    a[()] = v
    return a


def test_dict_vectorizer_string_vocab():
    d = _d({"cat": 2.5, "dog": 1.0, "ignored": 9.0})
    (got,) = run_op("DictVectorizer", {"x": d}, domain="ai.onnx.ml",
                    string_vocabulary=["ant", "cat", "dog"])
    np.testing.assert_allclose(got, [0.0, 2.5, 1.0])
    assert got.dtype == np.float32


def test_dict_vectorizer_int64_vocab_int_values():
    d = _d({7: 3, 5: 1})
    (got,) = run_op("DictVectorizer", {"x": d}, domain="ai.onnx.ml",
                    int64_vocabulary=[5, 6, 7])
    np.testing.assert_array_equal(got, [1, 0, 3])
    assert got.dtype == np.int64


def test_dict_vectorizer_batch_of_maps():
    a = np.empty(2, dtype=object)
    a[0] = {"a": 1.0}
    a[1] = {"b": 2.0, "a": 3.0}
    (got,) = run_op("DictVectorizer", {"x": a}, domain="ai.onnx.ml",
                    string_vocabulary=["a", "b"])
    assert got.shape == (2, 2)
    np.testing.assert_allclose(got, [[1.0, 0.0], [3.0, 2.0]])


def test_dict_vectorizer_feeds_device_graph():
    """The sklearn shape: DictVectorizer (host prolog) -> Scaler (device).
    The numeric boundary tensor must reach the jitted graph."""
    d = _d({"x1": 4.0, "x2": 8.0})
    nodes = [
        node("DictVectorizer", ["m"], ["feat"], domain="ai.onnx.ml",
             string_vocabulary=["x1", "x2"]),
        node("Scaler", ["feat"], ["y"], domain="ai.onnx.ml",
             offset=[1.0, 2.0], scale=[0.5, 0.25]),
    ]
    m = make_model(nodes, {"m": d}, ["y"])
    m2 = onnx_io.parse_model(onnx_io.serialize_model(m))
    y = np.asarray(Engine(import_model(m2)).run({"m": d}).outputs["y"])
    np.testing.assert_allclose(y.ravel(), [(4 - 1) * 0.5, (8 - 2) * 0.25],
                               rtol=1e-6)
